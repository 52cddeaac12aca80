"""Inference CLI: LDR JPEGs -> HDR .hdr files (reference test_real_refinement.py).

  python -m singlehdr_tpu.cli.infer --dir testImg/HDR-Real-input --output_path out

Restores either the finetune checkpoint (all four nets, --ref_ckpt style) or
the four per-net checkpoints into the composite pipeline.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.data.hdr_io import read_ldr, write_hdr
from singlehdr_tpu.inference import HdrPredictor
from singlehdr_tpu.train.checkpoint import restore_pretrained_subnets
from singlehdr_tpu.train.state import init_multi_state
from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
)


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Single-image HDR inference")
    p.add_argument("--dir", type=str, default=os.path.join(cwd, "testImg/HDR-Real-input"))
    p.add_argument("--output_path", type=str, default="HDR-Real-output")
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--ref_ckpt", type=str, default=os.path.join(cwd, "checkpoints/ref"))
    p.add_argument("--bucket", type=int, default=64, help="pad sizes to this multiple")
    p.add_argument("--weights", type=str, default=None,
                   help="consolidated .npz weights (overrides per-net ckpt dirs)")
    p.add_argument("--tiled", action="store_true",
                   help="constant-shape tiled inference for very large images")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--halo", type=int, default=64)
    return p


def load_pipeline_variables(args) -> dict:
    """Initialize the composite and graft whatever checkpoints exist.

    With ``--weights`` set, loads the consolidated .npz artifact instead
    (see cli.export_weights)."""
    if getattr(args, "weights", None):
        from singlehdr_tpu.train.weight_import import load_variables_npz

        return load_variables_npz(args.weights)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)  # init shape-agnostic
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
        "ref": RefinementNet(),
    }
    samples = {
        "deq": sample,
        "lin": sample,
        "hal": sample,
        "ref": jnp.zeros((1, 64, 64, 9), jnp.float32),
    }
    state = init_multi_state(modules, samples, jax.random.PRNGKey(0), 1e-5)
    state = restore_pretrained_subnets(
        state,
        {
            "deq": args.deq_ckpt,
            "lin": args.lin_ckpt,
            "hal": args.hal_ckpt,
            "ref": args.ref_ckpt,
        },
        1e-5,
    )
    return {"params": state.params, "batch_stats": state.batch_stats}


def run(args) -> None:
    out_dir = os.path.abspath(args.output_path)
    os.makedirs(out_dir, exist_ok=True)
    variables = load_pipeline_variables(args)
    if args.tiled:
        from singlehdr_tpu.tiled import TiledPredictor

        predictor = TiledPredictor(variables, tile=args.tile, halo=args.halo)
    else:
        predictor = HdrPredictor(variables, bucket_multiple=args.bucket)

    paths = sorted(glob.glob(os.path.join(args.dir, "*.jpg")))
    paths += sorted(glob.glob(os.path.join(args.dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no .jpg/.png under {args.dir}")
    for path in paths:
        t0 = time.perf_counter()
        rgb = read_ldr(path).astype(np.float32) / 255.0
        hdr = predictor(rgb)
        name = os.path.splitext(os.path.basename(path))[0] + ".hdr"
        write_hdr(os.path.join(out_dir, name), hdr)
        print(f"{name}: {rgb.shape[1]}x{rgb.shape[0]} in {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    run(build_parser().parse_args())
