#!/usr/bin/env python
"""HBM arena report: XLA temp/argument/output sizes for pipeline configs.

Compile-only — goes through the (remote) compile helper and never executes
on the chip, so it is safe to run while a training job owns the device.
This is the methodology that located the fused-encoder arena cost
(BENCH_NOTES "Round-3 honest re-measurement"): `compiled.memory_analysis()`
on the jitted forward, swept over batch sizes and fused-encoder settings.

    python tools/memory_report.py --batches 64,96,128 --size 512
    python tools/memory_report.py --net hal --fused 1 --batches 96
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="pipe", choices=["pipe", "deq", "lin", "hal", "ref"])
    p.add_argument("--batches", default="64,96,128")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--fused", default=None,
                   choices=[None, "0", "1", "auto"],
                   help="force SINGLEHDR_FUSED_ENC; 'auto' leaves the model's "
                   "arena-budget gate in charge (env unset) — use this when "
                   "isolating --fused-unet deltas; default = both forced "
                   "settings")
    p.add_argument("--fused-unet", dest="fused_unet", default=None,
                   choices=[None, "0", "1"],
                   help="force SINGLEHDR_FUSED_UNET (deq/ref fused encoder); "
                   "default leaves the model gate in charge")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from singlehdr_tpu.models import (
        DequantizationNet,
        HallucinationNet,
        LinearizationNet,
        RefinementNet,
        ReverseCameraPipeline,
    )

    cls = {
        "pipe": ReverseCameraPipeline,
        "deq": DequantizationNet,
        "lin": LinearizationNet,
        "hal": HallucinationNet,
        "ref": RefinementNet,
    }[args.net]
    dt = jnp.dtype(args.dtype)
    cin = 9 if args.net == "ref" else 3
    sd = jax.ShapeDtypeStruct
    fused_settings = [args.fused] if args.fused else ["1", "0"]
    for fused in fused_settings:
        if fused == "auto":
            os.environ.pop("SINGLEHDR_FUSED_ENC", None)
        else:
            os.environ["SINGLEHDR_FUSED_ENC"] = fused
        if args.fused_unet is not None:
            os.environ["SINGLEHDR_FUSED_UNET"] = args.fused_unet
        mod = cls(dtype=dt)
        v = jax.eval_shape(
            mod.init, jax.random.PRNGKey(0),
            sd((1, args.size, args.size, cin), jnp.float32),
        )

        def fwd(v, x):
            out = mod.apply(v, x)
            return out.hdr if args.net == "pipe" else out

        for b in (int(s) for s in args.batches.split(",")):
            x = sd((b, args.size, args.size, cin), jnp.float32)
            t0 = time.time()
            try:
                ma = jax.jit(fwd).lower(v, x).compile().memory_analysis()
            except Exception as e:
                print(f"{args.net} b{b} fused={fused}: compile FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})")
                continue
            gib = 2 ** 30
            print(
                f"{args.net} b{b} fused={fused}: "
                f"temp={ma.temp_size_in_bytes / gib:.2f} "
                f"args={ma.argument_size_in_bytes / gib:.2f} "
                f"out={ma.output_size_in_bytes / gib:.2f} GiB  "
                f"(compile {time.time() - t0:.0f}s)"
            )


if __name__ == "__main__":
    main()
