"""Benchmark: fundus segmentation throughput (imgs/sec/chip) on the flagship
Segtran2d (eff-b4, 3 translayers, REFUGE recipe, 288x288 patches) -- the
reference's headline 2D configuration (reference README.md:19-21).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference has no recorded throughput (SURVEY.md section 6);
its FPS profiler (reference train2d.py:1055-1061) on the GPUs used for the
paper runs this model at roughly 30 imgs/s (eff-b4 @ 288^2, bs 10, V100-class
-- estimated from the model's 35 GFLOPs/img and typical utilization). We use
REFERENCE_GPU_IMGS_PER_SEC = 30.0 as the fixed denominator so the ratio is
comparable across rounds.
"""
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_GPU_IMGS_PER_SEC = 30.0
BATCH = 32
WARMUP = 3
ITERS = 20


def main():
    from segtran_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes

    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    model = Segtran2d(cfg)
    x = jnp.zeros((BATCH, 288, 288, 3), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x[:1])
    variables = {"params": params, **rest}

    import sys
    print(f"[bench] params built, compiling... ({time.strftime('%H:%M:%S')})",
          file=sys.stderr, flush=True)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    t_c = time.perf_counter()
    out = fwd(variables, x)
    jax.block_until_ready(out)
    print(f"[bench] compiled in {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)
    for _ in range(WARMUP):
        jax.block_until_ready(fwd(variables, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    imgs_per_sec = BATCH * ITERS / dt

    print(json.dumps({
        "metric": "fundus_segtran2d_effb4_288_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_GPU_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
