"""Round-2 reference-flag exposure in train2d: --attnclip/--inbn/--outdrop/
--posw/--squeezeuseffn/--locprob/--exclusive/--supweight/--opt/--optfilter/
--robustaug (reference train2d.py argparser) and --tunebn BN-only adaptation
(train2d.py:747-751, 1089-1104)."""
import os
import shutil

import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"
pytestmark = pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                                reason="sample data not available")


def _fixture(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    return data_root


def test_train2d_reference_flag_combo(tmp_path):
    """The reference-parity knobs all wire through one training run."""
    data_root = _fixture(tmp_path)
    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--attnclip", "100", "--inbn", "--outdrop", "--posw", "0.5",
        "--squeezeuseffn", "--locprob", "0.5", "--exclusive",
        "--supweight", "0.5", "--opt", "sgd", "--optfilter", "out_,query",
        "--robustaug", "brightness,contrast", "--robustaugdeg", "0.7,1.3",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2", "--gradaccum", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))


def test_train2d_tunebn_updates_only_bn_stats(tmp_path):
    """--tunebn: params frozen, BatchNorm statistics adapt (the functional
    equivalent of the reference's eval-mode .train() BN trick)."""
    data_root = _fixture(tmp_path)
    from segtran_tpu.cli.train2d import main
    from segtran_tpu.train.checkpoint import load_checkpoint

    base = main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--attractors", "8", "--maxiter", "1", "--saveiter", "1",
        "--bs", "2", "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "m1"),
        "--ndevices", "1",
    ])
    tuned = main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--attractors", "8", "--tunebn",
        "--cp", os.path.join(base, "iter_1"),
        "--maxiter", "1", "--saveiter", "1",
        "--bs", "2", "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "m2"),
        "--ndevices", "1",
    ])
    p0 = load_checkpoint(os.path.join(base, "iter_1"))
    p1 = load_checkpoint(os.path.join(tuned, "iter_1"))

    def flat(t, pre=()):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from flat(v, pre + (k,))
        else:
            yield pre, np.asarray(t)

    for (k0, a), (k1, b) in zip(sorted(flat(p0["params"])),
                                sorted(flat(p1["params"]))):
        assert k0 == k1
        np.testing.assert_array_equal(a, b, err_msg=str(k0))
    stats_equal = all(
        np.array_equal(a, dict(flat(p1["batch_stats"]))[k])
        for k, a in flat(p0["batch_stats"]))
    assert not stats_equal, "BN stats did not adapt under --tunebn"


def test_robust_aug_changes_images():
    """brightness/contrast robust-aug actually perturbs images and leaves
    masks untouched (reference train_util.py:66-81 ColorJitter)."""
    import jax
    import jax.numpy as jnp
    from segtran_tpu.data.augment import Aug2dConfig, augment_batch_2d

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    msk = jnp.asarray((rng.rand(2, 32, 32, 3) > 0.5), jnp.float32)
    base = Aug2dConfig(randscale=0.0, fliplr_prob=0, flipud_prob=0,
                       rot90_prob=0, gray_alpha=0, colorjitter=False,
                       mean=(0, 0, 0), std=(1, 1, 1))
    aug = Aug2dConfig(randscale=0.0, fliplr_prob=0, flipud_prob=0,
                      rot90_prob=0, gray_alpha=0, colorjitter=False,
                      robust_aug=("brightness", "contrast"),
                      robust_aug_range=(0.5, 1.5),
                      mean=(0, 0, 0), std=(1, 1, 1))
    key = jax.random.PRNGKey(0)
    i0, m0 = augment_batch_2d(key, img, msk, base)
    i1, m1 = augment_batch_2d(key, img, msk, aug)
    assert not np.allclose(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    assert float(jnp.min(i1)) >= 0.0 and float(jnp.max(i1)) <= 1.0


def test_train3d_vnet_and_eval(tmp_path):
    """--net vnet in the 3D trainer (reference train3d.py:80,637-649) trains
    and evaluates end-to-end."""
    from test_cli3d import make_brats_fixture
    from segtran_tpu.cli.train3d import main as train_main
    from segtran_tpu.cli.test3d import main as test_main
    root = str(tmp_path / "data")
    make_brats_fixture(root)
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--net", "vnet",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))
    results = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--net", "vnet", "--cpdir", ckpt_dir, "--iters", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--bs", "4", "--dataroot", root,
    ])
    assert all(np.isfinite(results[1]))


def test_test2d_verbose_and_flop(tmp_path):
    """--verbose per-image dice + --flop params/GFLOPs print (reference
    test_util2d.py:72-73, test2d.py:623-631)."""
    data_root = _fixture(tmp_path)
    from segtran_tpu.cli.train2d import main as train_main
    from segtran_tpu.cli.test2d import main as eval_main
    ckpt_dir = train_main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--attractors", "8", "--maxiter", "1", "--saveiter", "1",
        "--bs", "2", "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "unet-scratch", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "1",
        "--origsize", "64", "--patchsize", "64",
        "--verbose", "--flop",
        "--dataroot", str(data_root), "--bs", "2",
    ])
    assert all(np.isfinite(results[1]))
    log = open(os.path.join(ckpt_dir, "eval_log.txt")).read()
    assert "params:" in log and "GFLOPs" in log
    assert log.count(": dice") >= 2


def test_train3d_arch_flag_combo(tmp_path):
    """3D arch knobs (--attnclip/--posw/--squeezeuseffn/--inbn/--outdrop/
    --pos sinu/--into3 avgto3, reference train3d.py argparser) wire through
    one training run; sinu's table now sizes from the real 3D grid."""
    from test_cli3d import make_brats_fixture
    from segtran_tpu.cli.train3d import main as train_main
    root = str(tmp_path / "data")
    make_brats_fixture(root)
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--attnclip", "100", "--posw", "0.5", "--squeezeuseffn", "--inbn",
        "--outdrop", "--pos", "sinu", "--into3", "avgto3",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))


def test_test2d_robustcp_and_aug_selection(tmp_path):
    """--robust with --robustcp (cross-checkpoint reference features,
    reference test2d.py:634-638) and --robustaug/--robustaugdeg selection."""
    data_root = _fixture(tmp_path)
    from segtran_tpu.cli.train2d import main as train_main
    from segtran_tpu.cli.test2d import main as eval_main
    ckpt_dir = train_main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--attractors", "8", "--maxiter", "2", "--saveiter", "1",
        "--bs", "2", "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "unet-scratch", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "2",
        "--origsize", "64", "--patchsize", "64",
        "--robust", "--robustsamples", "2",
        "--robustaug", "brightness,resize_down",
        "--robustaugdeg", "0.5,1.5",
        "--robustcp", os.path.join(ckpt_dir, "iter_1"),
        "--dataroot", str(data_root), "--bs", "2",
    ])
    rob = results[2]
    assert set(rob) == {"brightness", "resize_down"}
    for pert in rob.values():
        assert np.isfinite(pert["output_pearson"])
        # cross-checkpoint features after only 1 extra iter still correlate
        assert pert["output_pearson"] > 0.2


def test_test3d_verbose_and_flop(tmp_path):
    """test3d --verbose per-volume dice + --flop (reference test3d.py:44,
    348-356)."""
    from test_cli3d import make_brats_fixture
    from segtran_tpu.cli.train3d import main as train_main
    from segtran_tpu.cli.test3d import main as test_main
    root = str(tmp_path / "data")
    make_brats_fixture(root)
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--net", "vnet", "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    results = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--net", "vnet", "--cpdir", ckpt_dir, "--iters", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--verbose", "--flop", "--bs", "4", "--dataroot", root,
    ])
    assert all(np.isfinite(results[1]))
    log = open(os.path.join(ckpt_dir, "eval3d_log.txt")).read()
    assert "params:" in log and "GFLOPs" in log
    assert "case0: dice" in log


def test_train3d_25d_dgroup(tmp_path):
    """--segtran 25d --dgroup 2: slice grouping merges G consecutive depths
    into backbone channels (reference segtran25d.py:385-396); output is
    restored to the full depth."""
    from test_cli3d import make_brats_fixture
    from segtran_tpu.cli.train3d import main as train_main
    root = str(tmp_path / "data")
    make_brats_fixture(root)
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--segtran", "25d", "--dgroup", "2",
        "--translayers", "1", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))


def test_train2d_gradaccum_guards(tmp_path):
    """--gradaccum arg-validation fails fast, before model init: batch-joint
    attn-consistency loss is rejected, and the microbatch must stay
    divisible by the data-parallel device count (GSPMD resharding would
    otherwise erase the memory benefit)."""
    data_root = _fixture(tmp_path)
    from segtran_tpu.cli.train2d import main
    common = [
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-tiny", "--translayers", "1", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
    ]
    with pytest.raises(ValueError, match="attn"):
        main(common + ["--bs", "4", "--gradaccum", "2", "--attnconsist",
                       "--ndevices", "1"])
    with pytest.raises(ValueError, match="data-parallel"):
        # bs 4 / accum 2 -> microbatch 2, not divisible by 4 data devices
        main(common + ["--bs", "4", "--gradaccum", "2", "--ndevices", "4"])


def test_resolve_remat_blocks_boundary():
    """Adaptive remat default: ON below per-device microbatch 12, OFF at/above
    (round-5 bs sweep); grad-accum microbatching and dp sharding both count."""
    from segtran_tpu.cli.train2d import resolve_remat_blocks
    assert resolve_remat_blocks(6, 1, 1, 1) == (True, 6)
    assert resolve_remat_blocks(11, 1, 1, 1) == (True, 11)
    assert resolve_remat_blocks(12, 1, 1, 1) == (False, 12)
    assert resolve_remat_blocks(24, 1, 1, 1) == (False, 24)
    # dp sharding: global 24 over 4 chips -> per-device 6 -> remat on
    assert resolve_remat_blocks(24, 1, 4, 1) == (True, 6)
    # tp shrinks the dp axis: 8 devices tp=2 -> dp=4 -> per-device 12 -> off
    assert resolve_remat_blocks(48, 1, 8, 2) == (False, 12)
    # grad accumulation microbatches: 24/4 = 6 per microbatch -> remat on
    assert resolve_remat_blocks(24, 4, 1, 1) == (True, 6)
