"""Benchmarks for the two BASELINE.json headline metrics, on one chip:

1. fundus imgs/sec/chip -- Segtran2d forward (eff-b4, 3 translayers, REFUGE
   recipe, 288x288 patches), the reference's headline 2D configuration
   (reference README.md:19-21).
2. BraTS whole-volume voxels/sec/chip -- Segtran3d forward on a full padded
   160x192x144 BraTS volume in ONE jitted call with the fused squeezed
   attention (no sliding-window loop at all; the reference runs a Python
   triple loop of per-patch forwards, test_util3d.py:133-167).

3. fundus TRAIN steps/sec/chip -- the full jitted update on the same
   recipe at the reference's training batch size 6 (reference train2d.sh:2):
   forward + CE/dice loss + backward + BertAdam, so backward/optimizer-path
   regressions are visible to the driver (VERDICT r2 weakness 2).

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The fundus line is printed LAST (it was the round-1 headline metric).

vs_baseline: the reference records no throughput (SURVEY.md section 6). The
denominators are fixed estimates of the reference's V100-class throughput so
the ratio is comparable across rounds:
  * fundus: ~30 imgs/s (eff-b4 @ 288^2, bs 10 -- from the model's
    35 GFLOPs/img and typical GPU utilization),
  * brats: ~3.0 Mvox/s (per-patch python-loop sliding window at
    112^2x96 patches, bs 4 -- same estimation method).
Both are estimates, labelled here rather than in the metric name.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_GPU_IMGS_PER_SEC = 30.0
REFERENCE_GPU_VOXELS_PER_SEC = 3.0e6
# Train-step estimate for the same eff-b4 288^2 recipe at bs 6: ~3x the
# forward cost per image on a V100-class GPU => ~30/(3*6) ~ 1.7 steps/s.
REFERENCE_GPU_TRAIN_STEPS_PER_SEC = 1.7
TRAIN_BATCH = 6
# bs sweep on the v5e (round 3): 16: 338, 32: 351, 48: 362, 64: 365,
# 96: 360 imgs/s -- 64 is the throughput knee
BATCH = 64
WARMUP = 3
ITERS = 20
VOL_SHAPE = (160, 192, 144)   # padded BraTS'19 volume (240x240x155 cropped
                              # to the brain bounding box, brats_processing)
VOL_ITERS = 10


def _timeit(fn, args, warmup, iters):
    t_c = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[bench] compiled in {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_brats_wholevol():
    from segtran_tpu.configs import Segtran3dConfig
    from segtran_tpu.models.segtran3d import Segtran3d
    from segtran_tpu.nn.init import init_with_reference_schemes

    # round-5 tile sweep (tools/prof/_prof_tile3d.py): with the QK/V
    # reassociations default-on, XLA wins at every feasible flash tile at
    # this shape (XLA 53.73 Mvox/s vs best flash q1024n1024 52.84; q2048
    # tiles VMEM-OOM) -- the fused path still wins at the larger-N serving
    # shapes (test3d --wholevol --fused; 26 vs 1480 ms at N=65k).
    cfg = Segtran3dConfig(
        num_classes=4, num_attractors=1024, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran3d(cfg)
    x = jnp.zeros((1, *VOL_SHAPE, 4), jnp.float32)
    print(f"[bench] brats init... ({time.strftime('%H:%M:%S')})",
          file=sys.stderr, flush=True)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    variables = {"params": params, **rest}

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    dt = _timeit(fwd, (variables, x), WARMUP, VOL_ITERS)
    vox_per_sec = VOL_SHAPE[0] * VOL_SHAPE[1] * VOL_SHAPE[2] / dt
    print(json.dumps({
        "metric": "brats_wholevol_voxels_per_sec_per_chip",
        "value": round(vox_per_sec, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vox_per_sec / REFERENCE_GPU_VOXELS_PER_SEC, 3),
    }), flush=True)


def bench_fundus():
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes

    # use_fused_epilogue: Pallas fused expansion epilogue (one HBM pass for
    # private-output+LN+mode-pool, full-fusion tiers skip the mid tensor
    # entirely); round-3 A/B 402.5 vs 385.2 imgs/s, exact numerics
    # (_prof_epi.py).
    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        use_fused_epilogue=True, dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    model = Segtran2d(cfg)
    x = jnp.zeros((BATCH, 288, 288, 3), jnp.float32)
    print(f"[bench] fundus init... ({time.strftime('%H:%M:%S')})",
          file=sys.stderr, flush=True)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x[:1])
    variables = {"params": params, **rest}

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    dt = _timeit(fwd, (variables, x), WARMUP, ITERS)
    imgs_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "fundus_segtran2d_effb4_288_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_GPU_IMGS_PER_SEC, 3),
    }), flush=True)


def bench_fundus_train(bs=TRAIN_BATCH, remat_blocks=True, suffix=""):
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.train.trainer import (build_optimizer, make_loss_fn,
                                           make_train_step,
                                           create_train_state)

    # remat_blocks: per-MBConv jax.checkpoint (round-4 backward-HBM fix).
    # train2d's default is now ADAPTIVE per the round-5 bs sweep
    # (tools/prof/_prof_bs_train.py): ON below per-device batch 12 (here,
    # the reference-comparable bs-6 line), OFF at the bs-24 throughput
    # line where the small-batch conv blocking it works around is gone.
    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3, dtype=jnp.bfloat16,
        remat_blocks=remat_blocks,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    model = Segtran2d(cfg)
    x = jnp.zeros((bs, 288, 288, 3), jnp.float32)
    # one-hot fundus mask (disc/cup), as fundus_map_mask emits
    mask = jnp.zeros((bs, 288, 288, 3), jnp.float32)
    print(f"[bench] fundus train init... ({time.strftime('%H:%M:%S')})",
          file=sys.stderr, flush=True)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x[:1])
    tx = build_optimizer()   # BertAdam, reference REFUGE recipe defaults
    # fundus task recipe: bce_weight (0,1,2), dice_w 0.5 (configs/presets.py)
    loss_fn = make_loss_fn(cfg.num_classes, (0.0, 1.0, 2.0))
    state = create_train_state(params, rest.get("batch_stats", {}), tx,
                               jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model, tx, loss_fn), donate_argnums=0)
    batch = {"image": x, "mask": mask}

    def run(state):
        state, metrics = step(state, batch)
        return state

    # donated state: time by chaining steps, not replaying one
    t_c = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state.step)
    print(f"[bench] compiled in {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)
    for _ in range(WARMUP):
        state = run(state)
    jax.block_until_ready(state.step)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state = run(state)
    jax.block_until_ready(state.step)
    dt = (time.perf_counter() - t0) / ITERS
    steps_per_sec = 1.0 / dt
    # vs_baseline normalizes by imgs/s so the bs-24 line stays comparable
    # to the reference's bs-6 V100 estimate (1.7 steps/s * 6 imgs)
    ref_imgs = REFERENCE_GPU_TRAIN_STEPS_PER_SEC * TRAIN_BATCH
    print(json.dumps({
        "metric": "fundus_segtran2d_effb4_288_train_steps_per_sec_per_chip"
                  + suffix,
        "value": round(steps_per_sec, 2),
        "unit": f"steps/sec/chip (bs {bs})",
        "vs_baseline": round(steps_per_sec * bs / ref_imgs, 3),
    }), flush=True)


def main():
    from segtran_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    bench_brats_wholevol()
    bench_fundus_train()
    # throughput-oriented training line: bs 24, remat off (the knee of the
    # round-5 bs sweep -- 69 imgs/s vs 38 at the reference-comparable bs 6)
    bench_fundus_train(bs=24, remat_blocks=False, suffix="_bs24")
    bench_fundus()


if __name__ == "__main__":
    main()
