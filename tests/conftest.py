import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. The container's sitecustomize force-registers
# the axon TPU backend at interpreter start, so the env var alone is not
# enough -- override the platform via jax.config before any computation.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This host has one CPU core and XLA:CPU's LLVM pipeline dominates test wall
# clock; codegen quality is irrelevant for correctness tests.
for f in ("--xla_backend_optimization_level=0",
          "--xla_llvm_disable_expensive_passes=true"):
    if f not in flags:
        flags = (flags + " " + f).strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated suite runs (and reruns of individual
# files) skip recompiling unchanged jitted graphs -- the dominant cost of the
# suite on this 1-core host.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
