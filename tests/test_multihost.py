"""2-process jax.distributed smoke test (CPU backend).

Exercises parallel/multihost.init_multihost the way a real multi-host launch
would (reference counterpart: the torch.distributed 2-GPU launch,
train2d.sh:2 + train2d.py:796-801): two OS processes, a coordinator, a global
mesh spanning both, one data-parallel train step with DIFFERENT per-rank
batches, and an assertion that both ranks end with identical parameters --
which only holds if the cross-process gradient reduction actually ran.

The documented launch recipe (README.md, 'Multi-host training') is the same
invocation pattern with the real TPU pod env instead of the CPU fixture.
"""
import json
import os
import subprocess
import sys

import pytest


def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = 29731
    nprocs = 2
    env = dict(os.environ)
    # 2 virtual CPU devices per process -> 4 global devices
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs, outs = [], []
    for rank in range(nprocs):
        out = str(tmp_path / f"rank{rank}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(port), str(rank), str(nprocs), out],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["local_devices"] == 2
        assert r["global_devices"] == 4
    assert results[0]["is_master"] and not results[1]["is_master"]
    # the psum-reduced update must be identical on both ranks
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=0)
    assert results[0]["param_checksum"] == \
        pytest.approx(results[1]["param_checksum"], abs=0)
