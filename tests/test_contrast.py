"""Oracle-parity tests for the contrastive reference-feature machinery
(segtran_tpu/train/contrast.py vs reference internal_util.py:77-194).

The reference functions are exec'd straight out of internal_util.py
(importing the module pulls in receptivefield/cv2/matplotlib); they only
need torch / F / np / scipy.cdist.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_UTIL = "/root/reference/code/internal_util.py"

needs_ref = pytest.mark.skipif(not os.path.isfile(REF_UTIL),
                               reason="reference repo not available")


def _extract_reference(names=("pearson", "lr_pearson", "avg_hausdorff",
                              "avg_hausdorff_np",
                              "initialize_reference_features",
                              "calc_contrast_losses")):
    torch = pytest.importorskip("torch")
    from scipy.spatial.distance import cdist
    with open(REF_UTIL) as f:
        src = f.read()
    start = src.index("def pearson")
    end = src.index("\ndef eval_robustness", start)
    ns = {"torch": torch, "F": torch.nn.functional, "np": np, "cdist": cdist}
    exec(compile(src[start:end], REF_UTIL, "exec"), ns)
    return {n: ns[n] for n in names}, torch


@needs_ref
def test_pearson_parity():
    ref, torch = _extract_reference()
    from segtran_tpu.train.contrast import lr_pearson, pearson
    rng = np.random.RandomState(0)
    a = rng.randn(4, 6, 8).astype(np.float32)
    b = (0.3 * a + 0.5 * rng.randn(4, 6, 8)).astype(np.float32)
    want = ref["pearson"](torch.tensor(a), torch.tensor(b))
    got = float(pearson(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5
    want_lr = ref["lr_pearson"](torch.tensor(a))
    got_lr = float(lr_pearson(jnp.asarray(a)))
    assert abs(got_lr - want_lr) < 1e-5
    # constant input hits the norm<1e-5 guard
    c = np.ones((3, 3), np.float32)
    assert abs(float(pearson(jnp.asarray(c), jnp.asarray(c)))
               - ref["pearson"](torch.tensor(c), torch.tensor(c))) < 1e-6


@needs_ref
@pytest.mark.parametrize("one_way,topk,exclude_id",
                         [(True, 3, False), (False, 1, False),
                          (False, 1, True), (True, 1, True)])
def test_avg_hausdorff_parity(one_way, topk, exclude_id):
    ref, torch = _extract_reference()
    from segtran_tpu.train.contrast import avg_hausdorff
    rng = np.random.RandomState(1)
    a = rng.randn(17, 5).astype(np.float32)
    b = np.concatenate([rng.randn(9, 5), a[:2]]).astype(np.float32)  # dupes
    want = ref["avg_hausdorff"](torch.tensor(a), torch.tensor(b),
                                norm_p=2, topk=topk, one_way=one_way,
                                exclude_id=exclude_id)
    got = float(avg_hausdorff(jnp.asarray(a), jnp.asarray(b), topk=topk,
                              one_way=one_way, exclude_id=exclude_id))
    assert abs(got - float(want)) < 1e-4


@needs_ref
def test_avg_hausdorff_np_parity():
    ref, _ = _extract_reference()
    from segtran_tpu.train.contrast import avg_hausdorff_np
    rng = np.random.RandomState(2)
    a = rng.randn(12, 7)
    b = np.concatenate([rng.randn(6, 7), a[:1]])
    assert abs(avg_hausdorff_np(a, b) - ref["avg_hausdorff_np"](a, b)) < 1e-6


@needs_ref
def test_load_reference_features_parity(tmp_path):
    """Same seeded subsampling + class bucketing as the reference's
    initialize_reference_features (internal_util.py:99-125)."""
    ref, torch = _extract_reference()
    rng = np.random.RandomState(3)
    feats = rng.randn(200, 16).astype(np.float32)
    labels = rng.randint(0, 3, 200)
    pth = tmp_path / "feat.pth"
    torch.save({"features": torch.tensor(feats),
                "labels": torch.tensor(labels)}, pth)
    npz = tmp_path / "feat.npz"
    np.savez(npz, features=feats, labels=labels)

    from segtran_tpu.train.contrast import load_reference_features
    for path in (str(pth), str(npz)):
        bank, valid = load_reference_features(path, 40, 3,
                                              selected_ref_classes=(1, 2))
        assert bank.shape == (3, 40, 16) and not valid[0].any()
        for c in (1, 2):
            n = int(valid[c].sum())
            assert n == min(40, (labels == c).sum())
            # every bank vector is a real class-c feature vector
            cls = feats[labels == c]
            for v in bank[c][valid[c]][:5]:
                assert (np.abs(cls - v).sum(1) < 1e-6).any()


def _ref_contrast_args(num_classes, do_neg, ncf):
    class A:
        pass
    a = A()
    a.num_classes = num_classes
    a.do_neg_contrast = do_neg
    a.num_contrast_features = ncf
    a.num_ref_features = 10 ** 6   # never subsample the bank in the oracle
    return a


@needs_ref
@pytest.mark.parametrize("do_neg", [False, True])
def test_calc_contrast_losses_parity(do_neg):
    """Exact parity with the torch oracle when it does not subsample
    (num_contrast_features >= class pixel count): the jit-friendly
    mask-weighted full-grid statistic equals the boolean-masked mean.

    The oracle's ``features.transpose(1,3)`` maps [B,C,h,w] -> [B,w,h,C], a
    transposed-sampling quirk that is only shape-coherent on SQUARE grids;
    we implement the straight (h, w) correspondence (the absent trainer
    wiring means no on-path numerics depend on the quirk), so the fixture is
    square and the oracle input is oriented [B,C,w,h] to cancel it."""
    ref, torch = _extract_reference()
    from segtran_tpu.train.contrast import calc_contrast_losses
    rng = np.random.RandomState(4)
    b, h, w, c, k, r = 2, 6, 6, 5, 3, 7
    feats = rng.randn(b, h, w, c).astype(np.float32)
    # spatially-coherent exclusive mask (block pattern) so every class
    # survives the bilinear-downsample >= 0.5 threshold
    idx = (np.add.outer(np.arange(2 * h) // 4,
                        np.arange(2 * w) // 4) % k)[None].repeat(b, 0)
    mask = np.eye(k, dtype=np.float32)[idx]                    # [B,H,W,K]
    bank = rng.randn(k, r, c).astype(np.float32)
    valid = np.ones((k, r), bool)
    cls_w = np.asarray([0.0, 1.0, 2.0], np.float32)

    # ---- torch oracle ([B,C,w,h]: see docstring) ----
    tfeat = torch.tensor(feats).permute(0, 3, 2, 1)
    tmask = torch.tensor(mask).permute(0, 3, 1, 2)             # [B,K,H,W]
    ref_bank = [torch.tensor(bank[i]) for i in range(k)]
    np.random.seed(11)
    want_pos, want_neg = ref["calc_contrast_losses"](
        _ref_contrast_args(k, do_neg, 10 ** 6), tfeat, tmask, ref_bank,
        torch.tensor(cls_w))
    # reproduce the oracle's np.random neg-class draws for our rng input
    np.random.seed(11)
    neg_draws = np.array([(cls + np.random.randint(1, k)) % k
                          for cls in range(1, k)])

    got_pos, got_neg = calc_contrast_losses(
        jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(bank),
        jnp.asarray(valid), jnp.asarray(cls_w),
        rng=jax.random.PRNGKey(0), do_neg_contrast=do_neg)
    assert abs(float(got_pos) - float(want_pos)) < 1e-3
    if do_neg:
        # the neg class draw is random on both sides; force ours to the
        # oracle's draw by monkey-patching the offsets via the same formula
        offs = (neg_draws - np.arange(1, k)) % k
        offs_full = np.concatenate([[1], offs]).astype(np.int32)
        import segtran_tpu.train.contrast as C
        orig = jax.random.randint
        try:
            jax.random.randint = lambda *a, **kw: jnp.asarray(offs_full)
            got_pos2, got_neg2 = C.calc_contrast_losses(
                jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(bank),
                jnp.asarray(valid), jnp.asarray(cls_w),
                rng=jax.random.PRNGKey(0), do_neg_contrast=True)
        finally:
            jax.random.randint = orig
        assert abs(float(got_neg2) - float(want_neg)) < 1e-3


def test_calc_contrast_losses_gates():
    """Absent classes and empty banks contribute exactly 0, and the loss is
    differentiable w.r.t. the features."""
    from segtran_tpu.train.contrast import calc_contrast_losses
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(1, 4, 4, 6), jnp.float32)
    # only class 1 present in the mask; class 2's bank empty
    mask = np.zeros((1, 8, 8, 3), np.float32)
    mask[..., 1] = 1.0
    bank = jnp.asarray(rng.randn(3, 5, 6), jnp.float32)
    valid = np.ones((3, 5), bool)
    valid[2] = False
    cls_w = jnp.asarray([1.0, 1.0, 1.0])

    def f(x):
        pos, neg = calc_contrast_losses(
            x, jnp.asarray(mask), bank, jnp.asarray(valid), cls_w,
            rng=jax.random.PRNGKey(1), do_neg_contrast=True)
        return pos - neg
    val, g = jax.value_and_grad(f)(feats)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()

    # no foreground at all -> both losses 0
    pos, neg = calc_contrast_losses(
        feats, jnp.zeros((1, 8, 8, 3)), bank, jnp.asarray(valid), cls_w,
        rng=jax.random.PRNGKey(1), do_neg_contrast=True)
    assert float(pos) == 0.0 and float(neg) == 0.0


def test_hausdorff_matrix_and_featnorm(tmp_path):
    """tools.analysis.hausdorff_matrix: diagonal blocks (same dump, same
    class) use exclude_id so they measure intra-class spread; cross-class
    entries are symmetric-ish for identical dumps."""
    from segtran_tpu.tools.analysis import hausdorff_matrix
    rng = np.random.RandomState(6)
    for i in range(2):
        f = rng.randn(60, 8).astype(np.float16)
        l = np.repeat([0, 1, 2], 20)
        np.savez(tmp_path / f"d{i}.npz", features=f, labels=l)
    m = hausdorff_matrix([str(tmp_path / "d0.npz"),
                          str(tmp_path / "d1.npz")], 3)
    assert m.shape == (2, 3, 2, 3)
    assert (m >= 0).all() and np.isfinite(m).all()
    # identical class sets across dumps -> cross-dump same-class distance is
    # the intra-class spread, symmetric
    assert abs(m[0, 1, 1, 1] - m[1, 1, 0, 1]) < 1e-6

    from segtran_tpu.train.contrast import normalize_features_by_class
    f = rng.randn(30, 8).astype(np.float32) * 5 + 3
    l = np.repeat([0, 1, 2], 10)
    fn = normalize_features_by_class(f, l)
    assert np.abs(fn.mean(-1)).max() < 1e-4
    assert np.abs(fn.std(-1) - 1).max() < 1e-2
