"""Attention runtime diagnostics (cfg.attn_diag / train2d --attndiag): the
TPU-native form of the reference's every-500-calls max-attn/avg-attn/
clamp-count print (segtran_shared.py:569-587)."""
import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FUNDUS_DIR = "/root/reference/data/fundus/train"


def test_attn_diag_sown_and_collected():
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.train.da import collect_attn_diag

    cfg = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=3, num_attractors=8,
        attn_diag=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran2d(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    _, mstate = model.apply({"params": params, **rest}, x, train=False,
                            mutable=["intermediates"])
    diag = collect_attn_diag(mstate)
    assert diag is not None and diag.shape == (3,)
    mx, avg, clamps = (float(v) for v in diag)
    assert np.isfinite(mx) and np.isfinite(avg)
    # squeezed layer = 2 attention calls; nothing should clamp at init
    assert clamps == 0.0
    assert mx >= avg  # max over calls >= mean of positive-avgs

    # off by default: no attn_diag in the sown tree
    cfg_off = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=3, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    m2 = Segtran2d(cfg_off)
    p2, r2 = init_with_reference_schemes(
        m2, {"params": jax.random.PRNGKey(0)}, x)
    _, ms2 = m2.apply({"params": p2, **r2}, x, train=False,
                      mutable=["intermediates"])
    assert collect_attn_diag(ms2) is None


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_attn_diag_cli_log(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--attndiag", "1",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    log = open(os.path.join(ckpt_dir, "log.txt")).read()
    assert "max-attn" in log and "clamp-count" in log
