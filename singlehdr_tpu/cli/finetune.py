"""HDR-Real finetune CLI: full 4-net pipeline + Refinement-Net
(reference finetune_real_dataset.py).

  python -m singlehdr_tpu.cli.finetune --records ./records
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
)
from singlehdr_tpu.data.real import HdrRealPipeline
from singlehdr_tpu.train.checkpoint import restore_pretrained_subnets
from singlehdr_tpu.train.loop import run_real_finetune
from singlehdr_tpu.train.state import init_multi_state
from singlehdr_tpu.train.steps import make_finetune_train_step
from singlehdr_tpu.utils import create_run_dirs

LEARNING_RATE = 1e-5  # finetune_real_dataset.py:24
BATCH_SIZE = 4        # finetune_real_dataset.py:25


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Finetune full pipeline on HDR-Real")
    p.add_argument("--records", type=str, required=True, help=".shdrec directory")
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--ref_ckpt", type=str, default=os.path.join(cwd, "checkpoints/ref"))
    p.add_argument("--batch_size", type=int, default=BATCH_SIZE)
    p.add_argument("--lr", type=float, default=LEARNING_RATE)
    p.add_argument("--epochs", type=int, default=100_000)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"], help="compute dtype")
    p.add_argument("--mesh", type=str, default="",
                   help="'D' or 'D,S': data(,spatial) mesh axes over devices")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forwards in backward (fit larger batches)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 for multi-host runs")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    return p


def _parse_mesh(spec: str):
    if not spec:
        return None
    from singlehdr_tpu.parallel import make_mesh

    parts = [int(x) for x in spec.split(",")]
    data = parts[0]
    spatial = parts[1] if len(parts) > 1 else 1
    return make_mesh(data * spatial, spatial=spatial)


def run(args) -> None:
    from singlehdr_tpu.parallel import initialize_multihost

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)
    pipeline = HdrRealPipeline(args.records, batch_size=args.batch_size, training=True)
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
    state = init_multi_state(modules, samples, jax.random.PRNGKey(0), args.lr)
    state = restore_pretrained_subnets(
        state,
        {"deq": args.deq_ckpt, "lin": args.lin_ckpt, "hal": args.hal_ckpt},
        args.lr,
    )
    dirs = create_run_dirs(os.getcwd(), "ref")
    run_real_finetune(
        state=state,
        step_fn=make_finetune_train_step(jnp.dtype(args.dtype), remat=args.remat),
        pipeline=pipeline,
        epochs=args.epochs,
        ckpt_dir=args.ref_ckpt,
        log_dir=dirs["tensorboard"],
        mesh=_parse_mesh(args.mesh),
    )


if __name__ == "__main__":
    run(build_parser().parse_args())
