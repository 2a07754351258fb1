"""timm EfficientNetV2 -> flax converter mapping.

The reference initializes effv2 backbones from timm's pretrained
tf_efficientnetv2_{s,m,l}_in21k checkpoints (reference segtran2d.py:106-117).
timm is not installed in this container, so the mapping is validated against a
synthetic state_dict with timm's exact key layout and tensor shapes
(conv_stem/bn1, blocks.{s}.{j}.{conv|conv_exp|conv_pw|conv_dw|conv_pwl,
bn1-3, se.conv_reduce/expand}, conv_head/bn2/classifier head): strict
assignment onto a freshly-initialized EfficientNetV2Features tree proves the
rename covers every model parameter with the right shapes, and a BN-stat
numerics probe proves values land where the model reads them. A true
timm-vs-flax endpoint parity test runs when timm is importable.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from segtran_tpu.nn.backbones.efficientnetv2 import (_V2_CONFIGS, _V2_STEM,
                                                     EfficientNetV2Features)
from segtran_tpu.convert.torch_import import (convert_timm_effv2,
                                              rename_timm_effv2_key,
                                              assign_converted)


def synthetic_timm_sd(variant: str, seed: int = 0):
    """State dict with timm's tf_efficientnetv2 naming and shapes."""
    rng = np.random.RandomState(seed)
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.05)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            np.abs(rng.randn(c).astype(np.float32)) + 1.0)
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    stem = _V2_STEM[variant]
    sd["conv_stem.weight"] = t(stem, 3, 3, 3)
    bn("bn1", stem)

    in_ch = stem
    for si, (kind, r, k, s, e, oc, se) in enumerate(_V2_CONFIGS[variant]):
        for j in range(r):
            ic = in_ch if j == 0 else oc
            p = f"blocks.{si}.{j}"
            exp = ic * e
            if kind == "fused" and e == 1:
                sd[f"{p}.conv.weight"] = t(oc, ic, k, k)
                bn(f"{p}.bn1", oc)
            elif kind == "fused":
                sd[f"{p}.conv_exp.weight"] = t(exp, ic, k, k)
                bn(f"{p}.bn1", exp)
                sd[f"{p}.conv_pwl.weight"] = t(oc, exp, 1, 1)
                bn(f"{p}.bn2", oc)
            else:
                sd[f"{p}.conv_pw.weight"] = t(exp, ic, 1, 1)
                bn(f"{p}.bn1", exp)
                sd[f"{p}.conv_dw.weight"] = t(exp, 1, k, k)
                bn(f"{p}.bn2", exp)
                if se > 0:
                    nsq = max(1, int(ic * se))
                    sd[f"{p}.se.conv_reduce.weight"] = t(nsq, exp, 1, 1)
                    sd[f"{p}.se.conv_reduce.bias"] = t(nsq)
                    sd[f"{p}.se.conv_expand.weight"] = t(exp, nsq, 1, 1)
                    sd[f"{p}.se.conv_expand.bias"] = t(exp)
                sd[f"{p}.conv_pwl.weight"] = t(oc, exp, 1, 1)
                bn(f"{p}.bn3", oc)
        in_ch = oc

    # classifier head that features_only drops
    sd["conv_head.weight"] = t(1280, in_ch, 1, 1)
    bn("bn2", 1280)
    sd["classifier.weight"] = t(1000, 1280)
    sd["classifier.bias"] = t(1000)
    return sd


@pytest.mark.parametrize("variant", ["effv2s", "effv2m"])
def test_timm_effv2_mapping_covers_model(variant):
    import jax
    import jax.numpy as jnp
    from segtran_tpu.nn.init import init_with_reference_schemes

    sd = synthetic_timm_sd(variant)
    sd_np = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    conv_params, conv_stats = convert_timm_effv2(sd_np)

    bb = EfficientNetV2Features(variant=variant, stem_stride=1)
    params, rest = init_with_reference_schemes(
        bb, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    # strict=True: every model param must come from the checkpoint
    grafted = assign_converted(params, conv_params, strict=True)
    stats = assign_converted(rest["batch_stats"], conv_stats, strict=True)

    # nothing converted that the model does not own (head keys dropped)
    def leaf_paths(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaf_paths(v, prefix + (k,))
            else:
                yield prefix + (k,)
    assert set(leaf_paths(conv_params)) == set(leaf_paths(params))
    assert set(leaf_paths(conv_stats)) == set(leaf_paths(rest["batch_stats"]))

    # numerics probe: the stem conv kernel and a deep BN running-var made the
    # trip with the conv transpose applied
    np.testing.assert_allclose(
        grafted["conv_stem"]["kernel"],
        sd_np["conv_stem.weight"].transpose(2, 3, 1, 0), rtol=0, atol=0)
    last = f"s{len(_V2_CONFIGS[variant])-1}_b0"
    np.testing.assert_allclose(
        stats[last]["bn3"]["var"],
        sd_np[f"blocks.{len(_V2_CONFIGS[variant])-1}.0.bn3.running_var"])

    # the grafted tree runs
    out = bb.apply({"params": jax.tree_util.tree_map(jnp.asarray, grafted),
                    "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                   jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    assert len(out) == 5
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_rename_drops_head_keeps_blocks():
    assert rename_timm_effv2_key("conv_head.weight") is None
    assert rename_timm_effv2_key("bn2.running_mean") is None
    assert rename_timm_effv2_key("classifier.bias") is None
    assert rename_timm_effv2_key("bn1.weight") == "bn_stem.weight"
    assert (rename_timm_effv2_key("blocks.3.2.se.conv_reduce.bias")
            == "s3_b2.se_reduce.bias")
    assert (rename_timm_effv2_key("blocks.0.1.conv.weight")
            == "s0_b1.conv.weight")


@pytest.mark.skipif(pytest.importorskip is None, reason="")
def test_timm_endpoint_parity():
    timm = pytest.importorskip("timm")
    if not hasattr(timm, "create_model"):
        # test_segtran2d_parity installs a minimal timm stub in sys.modules so
        # the reference's module-level `import timm` works without the real
        # package; when that stub (or a broken install) is what we got, there
        # is no oracle to compare against.
        pytest.skip("timm is a stub (no create_model) -- real timm absent")
    import jax
    import jax.numpy as jnp
    from segtran_tpu.nn.init import init_with_reference_schemes

    tm = timm.create_model("tf_efficientnetv2_s", pretrained=False,
                           features_only=True)
    tm.eval()
    sd_np = {k: v.numpy() for k, v in tm.state_dict().items()}
    conv_params, conv_stats = convert_timm_effv2(sd_np)
    bb = EfficientNetV2Features(variant="effv2s", stem_stride=2)
    params, rest = init_with_reference_schemes(
        bb, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = assign_converted(params, conv_params, strict=True)
    stats = assign_converted(rest["batch_stats"], conv_stats, strict=True)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = bb.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                           stats)}, x, False)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(r.numpy().transpose(0, 2, 3, 1),
                                   np.asarray(o), atol=2e-4)
