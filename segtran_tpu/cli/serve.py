"""Production batch-inference server for trained 2D models.

Beyond-reference capability (the reference has no serving story — inference
is the offline ``test2d.py`` sweep): a stdlib-HTTP micro-batching server that
keeps ONE jitted fixed-shape forward resident on the chip and coalesces
concurrent requests into padded batches.

TPU-first design notes:
  * Fixed shapes: every request is resized to the task's ``orig_input_size``
    and batches are padded to ``--maxbatch``, so exactly one executable is
    compiled (at startup, against an empty batch) and every request hits the
    compiled path — no retrace, no per-shape compile stalls mid-traffic.
  * Micro-batching: a worker thread drains the request queue for at most
    ``--batchwait`` ms after the first arrival, then dispatches one padded
    batch. Throughput scales with occupancy while the worst-case added
    latency stays bounded by the wait window.
  * Single dispatch thread: one TPU process, one in-flight computation —
    matches the chip's execution model and keeps host<->device transfers
    serialized with compute.

Endpoints:
  POST /segment      image file (PNG/JPEG) -> PNG label mask at the input's
                     own resolution (fundus/polyp reference label encoding,
                     test_util2d.py:90-139's save format)
  POST /segment?probs=1  -> raw per-class float probabilities (npy bytes)
  GET  /healthz      liveness + model identity JSON
  GET  /statz        request/batch counters + latency percentiles JSON

Example:
  python -m segtran_tpu.cli.serve --task fundus --net segtran --bb eff-b4 \
      --cpdir model/segtran-fundus-... --iter 7000 --port 8601 --bf16
  curl -s -X POST --data-binary @eye.png localhost:8601/segment > mask.png
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import threading
import time

import numpy as np

from ..utils import setup_logging


def build_argparser():
    p = argparse.ArgumentParser(
        description="segtran_tpu micro-batching inference server")
    # model/checkpoint identity (the test2d subset that defines the network)
    p.add_argument("--task", dest="task_name", default="fundus")
    p.add_argument("--net", default="segtran")
    p.add_argument("--bb", dest="backbone_type", default="eff-b4")
    p.add_argument("--translayers", dest="num_translayers", type=int,
                   default=3)
    p.add_argument("--layercompress", dest="translayer_compress_ratios",
                   default=None)
    p.add_argument("--attractors", dest="num_attractors", type=int,
                   default=256)
    p.add_argument("--noqkbias", dest="qk_have_bias", action="store_false")
    p.add_argument("--nosqueeze", dest="use_squeezed_transformer",
                   action="store_false")
    p.add_argument("--pos", dest="pos_code_type", default="lsinu")
    p.add_argument("--mince", dest="use_mince_transformer",
                   action="store_true")
    p.add_argument("--mincescales", dest="mince_scales", default=None)
    p.add_argument("--minceprops", dest="mince_channel_props", default=None)
    p.add_argument("--infpn", dest="in_fpn_layers", default="34")
    p.add_argument("--outfpn", dest="out_fpn_layers", default="1234")
    p.add_argument("--polyformer", dest="polyformer_mode", default=None,
                   choices=[None, "source", "target"])
    p.add_argument("--cpdir", required=True)
    p.add_argument("--iter", dest="iter_num", type=int, required=True)
    p.add_argument("--origsize", dest="orig_input_size", default=None)
    p.add_argument("--patchsize", dest="patch_size", default=None)
    p.add_argument("--stats", dest="stats_json", default=None)
    p.add_argument("--gray", dest="gray_alpha", type=float, default=0.5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fusedepi", dest="use_fused_epilogue",
                   action="store_true",
                   help="Pallas fused output+LN+mode-pool epilogue")
    p.add_argument("--fused", dest="use_fused_attention",
                   action="store_true")
    p.add_argument("--scanblocks", dest="scan_blocks", action="store_true")
    # serving knobs
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8601)
    p.add_argument("--maxbatch", type=int, default=8,
                   help="padded batch size of the resident executable")
    p.add_argument("--batchwait", type=float, default=10.0,
                   help="max ms to wait for batch-mates after the first "
                        "request of a batch arrives")
    return p


class _Pending:
    """One enqueued request: input array + completion event + result slot."""

    __slots__ = ("image", "event", "probs", "error", "t_enq")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.probs = None
        self.error = None
        self.t_enq = time.perf_counter()


class InferenceEngine:
    """Owns the jitted forward and the micro-batching worker thread."""

    def __init__(self, args, logger):
        import jax
        import jax.numpy as jnp
        from ..configs.presets import TASK_SETTINGS
        from ..infer.sliding import sliding_window_2d
        from ..nn.backbones.efficientnet import maybe_adapt_scan_layout
        from ..nn.init import init_with_reference_schemes
        from ..train.checkpoint import load_checkpoint, merge_params
        from .test2d import build_model
        from .train2d import load_stats

        self.logger = logger
        self.args = args
        task = dict(TASK_SETTINGS[args.task_name])
        for field, override in (("orig_input_size", args.orig_input_size),
                                ("patch_size", args.patch_size)):
            if override:
                vals = tuple(int(v) for v in str(override).split(","))
                task[field] = vals * 2 if len(vals) == 1 else vals
        self.task = task
        self.num_classes = task["num_classes"]
        self.orig = tuple(task["orig_input_size"])
        patch = tuple(task["patch_size"])

        path = os.path.join(args.cpdir, f"iter_{args.iter_num}")
        if not os.path.isdir(path):
            raise FileNotFoundError(f"checkpoint dir not found: {path}")

        model, cfg = build_model(args, task)
        example = (1,) + patch + (3,)
        params, rest = init_with_reference_schemes(
            model, {"params": jax.random.PRNGKey(0)},
            jnp.zeros(example, jnp.float32))
        payload = load_checkpoint(path, cfg)
        want_scan = getattr(cfg, "scan_blocks", False)
        params = merge_params(params, maybe_adapt_scan_layout(
            payload.get("params", {}), args.backbone_type, want_scan))
        bstats = merge_params(rest.get("batch_stats", {}),
                              maybe_adapt_scan_layout(
                                  payload.get("batch_stats", {}),
                                  args.backbone_type, want_scan))
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        # one upload: checkpoint leaves are host numpy (merge_params), and a
        # numpy jit ARGUMENT would re-transfer through the tunnel every call
        variables = jax.device_put(variables)

        mean, std = load_stats(args, "train")
        mean_a, std_a = jnp.asarray(mean), jnp.asarray(std)
        gray_alpha = args.gray_alpha
        gray_w = jnp.asarray([0.299, 0.587, 0.114])

        def _preproc(image):
            gray = jnp.tensordot(image, gray_w, axes=[[-1], [0]])[..., None]
            x = (1 - gray_alpha) * image + gray_alpha * gray
            return (x - mean_a) / std_a

        B = args.maxbatch

        # variables ride as a jit argument (closed-over params become HLO
        # constants -> axon remote-compile HTTP 413 at eff-b4 scale)
        @jax.jit
        def _batched(variables, batch):         # [B, *orig, 3] in [0,1]
            def model_fn(image):
                return model.apply(variables, _preproc(image), train=False)
            return sliding_window_2d(model_fn, batch, self.orig, patch,
                                     num_classes=self.num_classes)

        self._batched = lambda batch: _batched(variables, batch)
        self._jnp = jnp
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.counters = {"requests": 0, "batches": 0, "occupancy_sum": 0}
        self.latencies = []                     # ring buffer, seconds
        self._lock = threading.Lock()

        t0 = time.time()
        logger.info("compiling resident executable (batch %d, %s)...",
                    B, self.orig)
        np.asarray(
            self._batched(jnp.zeros((B,) + self.orig + (3,), jnp.float32)))
        logger.info("compiled in %.1fs; serving", time.time() - t0)

        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, image: np.ndarray) -> _Pending:
        """image: [H, W, 3] float32 in [0,1] at self.orig resolution."""
        p = _Pending(image)
        self.queue.put(p)
        return p

    def _run(self):
        jnp = self._jnp
        B = self.args.maxbatch
        wait_s = self.args.batchwait / 1e3
        while True:
            first = self.queue.get()
            batch = [first]
            deadline = time.perf_counter() + wait_s
            while len(batch) < B:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=left))
                except queue.Empty:
                    break
            arr = np.zeros((B,) + self.orig + (3,), np.float32)
            for i, p in enumerate(batch):
                arr[i] = p.image
            try:
                probs = np.asarray(self._batched(jnp.asarray(arr)))
                for i, p in enumerate(batch):
                    p.probs = probs[i]
            except Exception as e:              # surface to every waiter
                for p in batch:
                    p.error = e
            now = time.perf_counter()
            with self._lock:
                self.counters["requests"] += len(batch)
                self.counters["batches"] += 1
                self.counters["occupancy_sum"] += len(batch)
                for p in batch:
                    self.latencies.append(now - p.t_enq)
                del self.latencies[:-1000]
            for p in batch:
                p.event.set()

    def stats(self):
        with self._lock:
            lat = sorted(self.latencies)
            c = dict(self.counters)
        pct = (lambda q: round(lat[int(q * (len(lat) - 1))] * 1e3, 2)) \
            if lat else (lambda q: None)
        return {
            **c,
            "avg_batch_occupancy": round(c["occupancy_sum"]
                                         / max(c["batches"], 1), 2),
            "latency_ms_p50": pct(0.5),
            "latency_ms_p95": pct(0.95),
        }


def make_handler(engine, args):
    from http.server import BaseHTTPRequestHandler
    from PIL import Image

    task_name = args.task_name

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):         # route to our logger
            engine.logger.info("http: " + fmt, *a)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "net": args.net,
                                 "task": task_name,
                                 "maxbatch": args.maxbatch,
                                 "input_size": list(engine.orig)})
            elif self.path == "/statz":
                self._json(200, engine.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/segment"):
                self._json(404, {"error": "unknown path"})
                return
            want_probs = "probs=1" in self.path
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                img = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception as e:
                self._json(400, {"error": f"cannot decode image: {e}"})
                return
            w0, h0 = img.size
            resized = img.resize((engine.orig[1], engine.orig[0]),
                                 Image.BILINEAR)
            arr = np.asarray(resized, np.float32) / 255.0
            pending = engine.submit(arr)
            pending.event.wait()
            if pending.error is not None:
                self._json(500, {"error": str(pending.error)})
                return
            probs = pending.probs               # [H, W, C]
            if want_probs:
                buf = io.BytesIO()
                np.save(buf, probs)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            from ..data.labelmaps import (fundus_inv_map_mask, harden_segmap,
                                          polyp_inv_map_mask)
            import jax.numpy as jnp
            hard = harden_segmap(jnp.asarray(probs)[None])
            inv = (fundus_inv_map_mask if task_name == "fundus"
                   else polyp_inv_map_mask)
            mask = np.asarray(inv(hard))[0]     # [H, W] uint8 label image
            out = Image.fromarray(mask).resize((w0, h0), Image.NEAREST)
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def make_server(args, logger=None):
    """Build engine + HTTP server (separated from main() for tests)."""
    from http.server import ThreadingHTTPServer
    logger = logger or setup_logging(args.cpdir, "serve_log.txt")
    engine = InferenceEngine(args, logger)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(engine, args))
    return httpd, engine


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    httpd, engine = make_server(args)
    engine.logger.info("listening on %s:%d", args.host,
                       httpd.server_address[1])
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    main()
