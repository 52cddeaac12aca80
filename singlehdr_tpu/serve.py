"""HTTP inference server: LDR images in, Radiance HDR out.

A dependency-free serving path (stdlib http.server) for the full 4-net
pipeline.  Requests are decoded on pool threads; device execution goes
through a micro-batcher: concurrent requests whose images round to the same
padded bucket are stacked into one device batch (batch-64 runs ~30% more
images/sec than batch-16 on v5e — BENCH_NOTES.md), with a short gather window
so a lone request is never held long.  Shape-bucketed compiled programs keep
mixed-size traffic on a small set of XLA executables.

  POST /predict      body: JPEG/PNG bytes -> 200, body: Radiance .hdr bytes
  GET  /healthz      -> 200 "ok"
  GET  /stats        -> JSON request counters/latencies/batching

Run:  python -m singlehdr_tpu.cli.serve --port 8080 --ref_ckpt ...
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from singlehdr_tpu.data import hdr_io
from singlehdr_tpu.inference import HdrPredictor

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


class _Stats:
    # Sliding window per bucket for percentile estimates: big enough that
    # p99 over a load test is sample-backed, small enough to stay O(ms) to
    # summarize on a /stats hit.
    WINDOW = 4096

    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.total_latency = 0.0
        self.device_batches = 0
        self.max_batch = 0
        self.latencies: "dict[str, deque]" = {}

    def record(self, latency: float, error: bool, bucket=None) -> None:
        with self.lock:
            self.requests += 1
            self.errors += int(error)
            self.total_latency += latency
            if not error:
                key = "x".join(map(str, bucket)) if bucket else "unbucketed"
                self.latencies.setdefault(
                    key, deque(maxlen=self.WINDOW)
                ).append(latency)

    def record_batch(self, size: int) -> None:
        with self.lock:
            self.device_batches += 1
            self.max_batch = max(self.max_batch, size)

    @staticmethod
    def _percentiles(samples) -> dict:
        arr = np.sort(np.asarray(samples, np.float64))
        pick = lambda q: float(arr[min(len(arr) - 1, int(q * len(arr)))])
        return {
            "n": len(arr),
            "p50_s": round(pick(0.50), 4),
            "p90_s": round(pick(0.90), 4),
            "p99_s": round(pick(0.99), 4),
            "max_s": round(float(arr[-1]), 4),
        }

    def snapshot(self) -> dict:
        with self.lock:
            mean = self.total_latency / self.requests if self.requests else 0.0
            per_bucket = {
                k: self._percentiles(v) for k, v in self.latencies.items() if v
            }
            all_lat = [x for v in self.latencies.values() for x in v]
            return {
                "requests": self.requests,
                "errors": self.errors,
                "mean_latency_s": round(mean, 4),
                "latency": self._percentiles(all_lat) if all_lat else {},
                "latency_per_bucket": per_bucket,
                "device_batches": self.device_batches,
                "max_batch": self.max_batch,
            }


class MicroBatcher:
    """Groups concurrent same-bucket requests into one device batch.

    Requests land in per-bucket FIFO queues stamped with a global arrival
    sequence number.  One worker thread repeatedly serves the bucket whose
    head request is oldest — strict arrival-order fairness across buckets, so
    sustained traffic on one shape can never starve another.  Within the
    chosen bucket it waits up to ``window_s`` for more same-bucket requests
    (up to ``max_batch``) before running them as a single batched forward and
    resolving each request's Future.
    """

    def __init__(
        self,
        predictor: HdrPredictor,
        stats: _Stats,
        max_batch: int = 32,
        window_s: float = 0.01,
    ):
        self._predictor = predictor
        self._stats = stats
        self._max_batch = max_batch
        self._window = window_s
        self._cv = threading.Condition()
        self._pending: "dict[tuple, deque]" = {}
        self._seq = 0
        self._thread = threading.Thread(target=self._loop, daemon=True, name="batcher")
        self._thread.start()

    def bucket_key(self, shape) -> tuple:
        return self._predictor.bucket_key(shape)

    def predict(self, rgb01: np.ndarray) -> np.ndarray:
        fut: "Future[np.ndarray]" = Future()
        key = self._predictor.bucket_key(rgb01.shape)
        with self._cv:
            self._pending.setdefault(key, deque()).append((self._seq, rgb01, fut))
            self._seq += 1
            self._cv.notify()
        return fut.result()

    def _oldest_bucket(self):
        """Key of the non-empty bucket whose head arrived first (or None)."""
        best_key, best_seq = None, None
        for k, d in self._pending.items():
            if d and (best_seq is None or d[0][0] < best_seq):
                best_key, best_seq = k, d[0][0]
        return best_key

    def _loop(self) -> None:
        while True:
            with self._cv:
                key = self._oldest_bucket()
                while key is None:
                    self._cv.wait()
                    key = self._oldest_bucket()
                group = []
                d = self._pending[key]
                while d and len(group) < self._max_batch:
                    group.append(d.popleft())
            # gather window: same-bucket requests arriving within window_s
            deadline = time.perf_counter() + self._window
            while len(group) < self._max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                with self._cv:
                    d = self._pending.get(key)
                    if not d:
                        self._cv.wait(timeout)
                        d = self._pending.get(key)
                    while d and len(group) < self._max_batch:
                        group.append(d.popleft())
            self._stats.record_batch(len(group))
            try:
                outs = self._predictor.predict_batch([im for _, im, _ in group])
                for (_, _, f), out in zip(group, outs):
                    f.set_result(out)
            except Exception as e:  # noqa: BLE001 — fail the whole group
                for _, _, f in group:
                    if not f.done():
                        f.set_exception(e)


def _decode_ldr(body: bytes) -> np.ndarray:
    if not _HAS_CV2:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("could not decode image body")
    return np.ascontiguousarray(img[:, :, ::-1])


def _encode_hdr(hdr_rgb: np.ndarray) -> bytes:
    if _HAS_CV2:
        ok, buf = cv2.imencode(".hdr", hdr_rgb[:, :, ::-1])
        if ok:
            return buf.tobytes()
    # pure-numpy flat RGBE fallback
    data = hdr_io.rgbe_encode(hdr_rgb)
    h, w, _ = hdr_rgb.shape
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    return header + data.tobytes()


def make_server(
    predictor: HdrPredictor,
    host: str = "127.0.0.1",
    port: int = 8080,
    max_batch: int = 32,
    batch_window_s: float = 0.01,
):
    """Build (not start) the HTTP server around a predictor."""
    stats = _Stats()
    batcher = MicroBatcher(
        predictor, stats, max_batch=max_batch, window_s=batch_window_s
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, body: bytes, ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            elif self.path == "/stats":
                self._reply(
                    200, json.dumps(stats.snapshot()).encode(), "application/json"
                )
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, b"not found", "text/plain")
                return
            t0 = time.perf_counter()
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length <= 0 or length > 256 << 20:
                    raise ValueError("missing or oversized body")
                rgb = _decode_ldr(self.rfile.read(length)).astype(np.float32) / 255.0
                bucket = batcher.bucket_key(rgb.shape)
                hdr = batcher.predict(rgb)
                body = _encode_hdr(hdr)
                stats.record(time.perf_counter() - t0, error=False,
                             bucket=bucket)
                self._reply(200, body, "image/vnd.radiance")
            except Exception as e:  # noqa: BLE001 — map any failure to 400
                stats.record(time.perf_counter() - t0, error=True)
                self._reply(400, f"error: {e}".encode(), "text/plain")

    server = ThreadingHTTPServer((host, port), Handler)
    server.stats = stats
    return server
