"""Micro-batching inference server (cli/serve.py): checkpoint load, fixed
batched executable, HTTP surface, and request coalescing (beyond-reference;
the reference has no serving path)."""
import argparse
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from segtran_tpu.cli.serve import build_argparser, make_server
    from segtran_tpu.cli.test2d import build_model
    from segtran_tpu.configs.presets import TASK_SETTINGS
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.train.checkpoint import save_checkpoint, wait_for_saves

    tmp = tmp_path_factory.mktemp("serve")
    cpdir = tmp / "ckpt"
    cpdir.mkdir()

    argv = ["--task", "fundus", "--net", "segtran", "--bb", "eff-b0",
            "--translayers", "1", "--attractors", "8",
            "--origsize", "64", "--patchsize", "64",
            "--cpdir", str(cpdir), "--iter", "5",
            "--port", "0", "--maxbatch", "2", "--batchwait", "40"]
    args = build_argparser().parse_args(argv)

    task = dict(TASK_SETTINGS["fundus"])
    task["orig_input_size"] = (64, 64)
    task["patch_size"] = (64, 64)
    model, cfg = build_model(args, task)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    save_checkpoint(str(cpdir), 5, params,
                    batch_stats=rest.get("batch_stats"), cfg=cfg)
    wait_for_saves()

    import logging
    httpd, engine = make_server(args, logger=logging.getLogger("serve-test"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", engine
    httpd.shutdown()


def _png_bytes(h, w, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read(), r.headers.get("Content-Type")


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["input_size"] == [64, 64]


def test_segment_mask_roundtrip(server):
    from PIL import Image
    url, _ = server
    # a non-model-resolution input: the mask must come back at ITS size
    body, ctype = _post(url + "/segment", _png_bytes(90, 130))
    assert ctype == "image/png"
    mask = Image.open(io.BytesIO(body))
    assert mask.size == (130, 90)
    vals = set(np.asarray(mask).reshape(-1).tolist())
    # fundus inverse label encoding: {0 cup, 128 disc, 255 background}
    assert vals <= {0, 128, 255}


def test_segment_probs_mode(server):
    url, _ = server
    body, ctype = _post(url + "/segment?probs=1", _png_bytes(64, 64, seed=1))
    assert ctype == "application/octet-stream"
    probs = np.load(io.BytesIO(body))
    assert probs.shape == (64, 64, 3)
    assert np.isfinite(probs).all()


def test_microbatch_coalesces(server):
    url, engine = server
    before = engine.stats()
    results = {}

    def worker(i):
        results[i] = _post(url + "/segment", _png_bytes(64, 64, seed=10 + i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == {0, 1}
    after = engine.stats()
    assert after["requests"] - before["requests"] == 2
    # 2 concurrent posts within the 40 ms window should share batches:
    # strictly fewer batches than requests proves coalescing happened
    assert after["batches"] - before["batches"] <= 2
    assert after["latency_ms_p50"] is not None


def test_bad_image_is_400(server):
    url, _ = server
    req = urllib.request.Request(url + "/segment", data=b"not a png",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
