"""Quality evaluation CLI: PSNR/SSIM of the full pipeline on HDR-Real records.

The reference ships no evaluation at all (SURVEY.md §4); this provides the
parity surface for the <0.1 dB PSNR target: linear-domain and mu-tonemapped
PSNR plus SSIM over a record set, with the finetune driver's mean-0.5
renormalization applied to prediction and ground truth alike
(finetune_real_dataset.py:47,173).

  python -m singlehdr_tpu.cli.evaluate --records ./records --ref_ckpt ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.cli.infer import load_pipeline_variables
from singlehdr_tpu.data.real import HdrRealPipeline
from singlehdr_tpu.models import ReverseCameraPipeline
from singlehdr_tpu.ops.tonemap import mu_tonemap
from singlehdr_tpu.train.metrics import Mean, psnr, ssim


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Evaluate pipeline PSNR/SSIM")
    p.add_argument("--records", type=str, required=True)
    p.add_argument("--prefix", type=str, default="train")
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--ref_ckpt", type=str, default=os.path.join(cwd, "checkpoints/ref"))
    p.add_argument("--weights", type=str, default=None,
                   help="consolidated .npz weights (overrides per-net ckpt dirs)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=0, help="0 = full set")
    p.add_argument(
        "--linear_peak", type=float, default=1.0,
        help="fixed peak for linear-domain PSNR; both pred and gt are mean-0.5 "
        "renormalized, so any fixed constant gives run-comparable numbers "
        "(a per-batch gt.max() would make the metric depend on batch composition)",
    )
    return p


def run(args) -> dict:
    variables = load_pipeline_variables(args)
    pipe = ReverseCameraPipeline()

    @jax.jit
    def metrics_step(packed):
        """One packed upload in, three device scalars out — per-batch float()
        syncs serialized ~3 extra tunnel round-trips into every eval batch
        (BENCH_NOTES r5 'fixed latency per transfer')."""
        b = packed.shape[0] // 2
        ldr, gt = packed[:b], packed[b:]
        out = pipe.apply(variables, ldr).hdr
        pred = out / (1e-6 + jnp.mean(out, axis=(1, 2, 3), keepdims=True)) * 0.5
        pred_mu, gt_mu = mu_tonemap(pred), mu_tonemap(gt)
        return (
            psnr(pred, gt, max_val=args.linear_peak),
            psnr(pred_mu, gt_mu),
            ssim(pred_mu, gt_mu),
        )

    data = HdrRealPipeline(
        args.records, batch_size=args.batch_size, training=False, prefix=args.prefix
    )
    m_psnr_lin, m_psnr_mu, m_ssim_mu = Mean(), Mean(), Mean()
    pending = []
    for i, (ldr, hdr) in enumerate(data.epoch()):
        if args.max_batches and i >= args.max_batches:
            break
        if ldr.shape[0] != args.batch_size:
            continue  # skip the short tail batch (avoids a recompile)
        pending.append(metrics_step(jnp.asarray(np.concatenate([ldr, hdr]))))
        if len(pending) > 3:  # bound the dispatch queue a few batches deep
            pending[-4] = tuple(float(v) for v in pending[-4])
    for tup in pending:
        lin_db, mu_db, ss = (float(v) for v in tup)
        m_psnr_lin.update(lin_db)
        m_psnr_mu.update(mu_db)
        m_ssim_mu.update(ss)
    results = {
        "psnr_linear_db": round(m_psnr_lin.result(), 3),
        "psnr_mu_db": round(m_psnr_mu.result(), 3),
        "ssim_mu": round(m_ssim_mu.result(), 4),
    }
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    run(build_parser().parse_args())
