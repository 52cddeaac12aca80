#!/usr/bin/env python
"""Mixed-shape serving load test: publishes latency percentiles per bucket.

Drives the real HTTP server (singlehdr_tpu.serve.make_server over
inference.HdrPredictor) with concurrent clients posting JPEGs of mixed
sizes — the tests/test_serve.py load-test shape, but at serving scale on
the actual chip — then prints the /stats snapshot (p50/p90/p99 overall and
per padded bucket) as one JSON line for BENCH_NOTES (VERDICT r4 weak #6).

    python tools/serve_load.py --requests 96 --clients 8 \
        --shapes 384x512,512x512,256x384
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=96, help="total requests")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--shapes", default="384x512,512x512,256x384")
    p.add_argument("--batch", type=int, default=8,
                   help="micro-batcher max batch")
    p.add_argument("--bucket_multiple", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from singlehdr_tpu.inference import HdrPredictor
    from singlehdr_tpu.models import ReverseCameraPipeline
    from singlehdr_tpu.serve import make_server

    shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]

    pipe = ReverseCameraPipeline()
    variables = jax.jit(pipe.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    predictor = HdrPredictor(variables, bucket_multiple=args.bucket_multiple)
    srv = make_server(predictor, "127.0.0.1", 0, max_batch=args.batch)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    rng = np.random.RandomState(0)
    bodies = []
    for h, w in shapes:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        bodies.append(buf.tobytes())

    # warmup: one request per shape compiles each bucket
    for body in bodies:
        urllib.request.urlopen(
            urllib.request.Request(f"{url}/predict", data=body), timeout=600
        ).read()

    def client(idx: int, n: int):
        r = np.random.RandomState(idx)
        for _ in range(n):
            body = bodies[r.randint(len(bodies))]
            urllib.request.urlopen(
                urllib.request.Request(f"{url}/predict", data=body),
                timeout=600,
            ).read()

    per = args.requests // args.clients
    threads = [
        threading.Thread(target=client, args=(i, per))
        for i in range(args.clients)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    stats = json.loads(
        urllib.request.urlopen(f"{url}/stats", timeout=60).read()
    )
    out = {
        "requests": per * args.clients,
        "clients": args.clients,
        "shapes": args.shapes,
        "wall_s": round(wall, 2),
        "req_s": round(per * args.clients / wall, 2),
        "latency": stats.get("latency", {}),
        "latency_per_bucket": stats.get("latency_per_bucket", {}),
        "device_batches": stats.get("device_batches"),
        "max_batch": stats.get("max_batch"),
    }
    print(json.dumps(out))
    srv.shutdown()


if __name__ == "__main__":
    main()
