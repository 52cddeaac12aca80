"""HDR-Synth validation CLI: held-out losses the reference defines but never
runs (dataset.py:279-310 builds validation/test splits no driver consumes).

Evaluates forward-only metrics over the validation split — deq PSNR on
quantized inputs, lin curve MSE + linearized-irradiance PSNR — using the
held-out CRFs and a 5-step exposure ladder.

  python -m singlehdr_tpu.cli.validate_synth --hdrdir /data/HDR-Synth
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.data.loader import RandomSampleLoader
from singlehdr_tpu.data.synth import get_validation_dataset
from singlehdr_tpu.models import DequantizationNet, LinearizationNet
from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.degradation import simulate_capture
from singlehdr_tpu.train.checkpoint import CheckpointManager
from singlehdr_tpu.train.metrics import Mean, psnr
from singlehdr_tpu.train.state import init_net_state


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Validate deq/lin on held-out HDR-Synth")
    p.add_argument("--hdrdir", type=str, required=True)
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--size", type=int, default=512,
                   help="center-crop validation patches to this size")
    return p


def run(args) -> dict:
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    deq_state = CheckpointManager(args.deq_ckpt).restore(
        init_net_state(DequantizationNet(), rng, sample, 1e-4)
    )
    lin_state = CheckpointManager(args.lin_ckpt).restore(
        init_net_state(LinearizationNet(), rng, sample, 1e-4)
    )
    deq, lin = DequantizationNet(), LinearizationNet()

    @jax.jit
    def evaluate(key, hdr, crf, invcrf, t):
        sim = simulate_capture(key, hdr, crf, t)
        jpeg = sim.quantized_u8.astype(jnp.float32) / 255.0  # quantization only
        c_pred = jnp.clip(
            deq.apply(
                {"params": deq_state.params, "batch_stats": deq_state.batch_stats},
                jpeg,
            ),
            0.0,
            1.0,
        )
        pred_invcrf = lin.apply(
            {"params": lin_state.params, "batch_stats": lin_state.batch_stats},
            sim.ldr,
        )
        b_pred = apply_rf(sim.ldr, pred_invcrf)
        return {
            "deq_psnr": psnr(c_pred, sim.ldr),
            "lin_psnr": psnr(b_pred, sim.clipped_hdr_t),
            "crf_mse": jnp.mean(jnp.square(pred_invcrf - invcrf)),
        }

    dataset = get_validation_dataset(args.hdrdir)
    means = {k: Mean(k) for k in ("deq_psnr", "lin_psnr", "crf_mse")}
    with RandomSampleLoader(dataset, args.batch_size, n_workers=8) as loader:
        for i in range(args.batches):
            hdr, crf, invcrf, t = [jnp.asarray(x) for x in loader.read_batch()]
            if hdr.shape[1] > args.size:
                off = (hdr.shape[1] - args.size) // 2
                hdr = hdr[:, off : off + args.size, off : off + args.size]
            out = evaluate(jax.random.PRNGKey(i), hdr, crf, invcrf, t)
            for k, v in out.items():
                means[k].update(float(v))
    results = {k: round(m.result(), 4) for k, m in means.items()}
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    run(build_parser().parse_args())
