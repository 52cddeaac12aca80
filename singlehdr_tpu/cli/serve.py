"""Serving CLI: HTTP endpoint for single-image HDR reconstruction.

  python -m singlehdr_tpu.cli.serve --port 8080 \
      --deq_ckpt ... --lin_ckpt ... --hal_ckpt ... --ref_ckpt ...

POST an LDR JPEG/PNG to /predict and receive a Radiance .hdr body.
"""

from __future__ import annotations

import argparse
import os

from singlehdr_tpu.cli.infer import load_pipeline_variables
from singlehdr_tpu.inference import HdrPredictor
from singlehdr_tpu.serve import make_server


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Serve HDR reconstruction over HTTP")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--ref_ckpt", type=str, default=os.path.join(cwd, "checkpoints/ref"))
    p.add_argument("--weights", type=str, default=None,
                   help="consolidated .npz weights (overrides per-net ckpt dirs)")
    p.add_argument("--bucket", type=int, default=64,
                   help="pad request sizes to this multiple (bounds compiles)")
    p.add_argument("--max_batch", type=int, default=32,
                   help="largest device batch the micro-batcher assembles "
                        "(throughput rises through b96 on v5e — BENCH_NOTES)")
    p.add_argument("--batch_window_ms", type=float, default=10.0,
                   help="gather window for coalescing same-bucket requests")
    p.add_argument("--warmup", type=str, default="512x512",
                   help="comma-separated HxW sizes to pre-compile at startup "
                        "(batch 1 and --max_batch each); '' disables")
    return p


def _parse_sizes(spec: str):
    sizes = []
    for part in filter(None, (s.strip() for s in spec.split(","))):
        h, w = part.lower().split("x")
        sizes.append((int(h), int(w)))
    return sizes


def run(args) -> None:
    predictor = HdrPredictor(
        load_pipeline_variables(args), bucket_multiple=args.bucket
    )
    sizes = _parse_sizes(args.warmup)
    if sizes:
        print(f"warming {len(sizes)} bucket(s) at batch 1 and {args.max_batch}...")
        predictor.warmup(sizes, batch_sizes=(1, args.max_batch))
    server = make_server(
        predictor, args.host, args.port,
        max_batch=args.max_batch,
        batch_window_s=args.batch_window_ms / 1e3,
    )
    print(f"serving on http://{args.host}:{args.port}  (POST /predict)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    run(build_parser().parse_args())
