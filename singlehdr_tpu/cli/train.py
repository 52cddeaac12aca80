"""Per-net pretraining CLI on HDR-Synth (reference train.py surface).

Example:
  python -m singlehdr_tpu.cli.train --hdrdir /data/HDR-Synth --deq true
  python -m singlehdr_tpu.cli.train --hdrdir /data/HDR-Synth --lin true --hal true

Fixes two reference breakages by construction: ``--hdrdir`` is actually read
(train.py defines --hdrdir but reads args.dir, train.py:87,352) and argparse is
invoked correctly (missing parens at train.py:361).
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
    Vgg16Features,
)
from singlehdr_tpu.data.synth import get_train_dataset
from singlehdr_tpu.train import steps as steps_mod
from singlehdr_tpu.train.loop import LoopConfig, run_synth_training
from singlehdr_tpu.train.state import init_net_state
from singlehdr_tpu.utils import create_run_dirs, str2bool

LEARNING_RATE = 1e-4  # train.py:20
BATCH_SIZE = 16       # train.py:19


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Pretrain deq/lin/hal on HDR-Synth")
    p.add_argument("--hdrdir", "--dir", dest="hdrdir", type=str, required=True)
    p.add_argument("--deq", type=str2bool, default=False)
    p.add_argument("--lin", type=str2bool, default=False)
    p.add_argument("--hal", type=str2bool, default=False)
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--vgg_ckpt", type=str, default=os.path.join(cwd, "vgg16.npy"))
    p.add_argument("--batch_size", type=int, default=BATCH_SIZE)
    p.add_argument("--lr", type=float, default=LEARNING_RATE)
    p.add_argument("--iterations", type=int, default=5_000_000)
    p.add_argument("--jpeg", type=str2bool, default=True)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"], help="compute dtype")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--mesh", type=str, default="",
                   help="'D' or 'D,S': data(,spatial) mesh axes over devices")
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
    cfg = LoopConfig(
        batch_size=args.batch_size,
        iterations=args.iterations,
        use_jpeg=args.jpeg,
        n_workers=args.workers,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
    )
    dataset = get_train_dataset(args.hdrdir, patch_size=args.patch_size)
    dtype = jnp.dtype(args.dtype)
    mesh = _parse_mesh(args.mesh)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)  # init shape-agnostic
    rng = jax.random.PRNGKey(0)

    if args.deq:
        state = init_net_state(DequantizationNet(), rng, sample, args.lr)
        dirs = create_run_dirs(os.getcwd(), "deq")
        run_synth_training(
            module_name="deq",
            state=state,
            step_fn=steps_mod.make_deq_train_step(dtype),
            dataset=dataset,
            cfg=cfg,
            ckpt_dir=args.deq_ckpt,
            log_dir=dirs["tensorboard"],
            batch_to_args=lambda b: (b["ldr"], b["jpeg"], b["mask"]),
            image_taps=(),
            mesh=mesh,
        )
    if args.lin:
        state = init_net_state(LinearizationNet(), rng, sample, args.lr)
        dirs = create_run_dirs(os.getcwd(), "lin")
        run_synth_training(
            module_name="lin",
            state=state,
            step_fn=steps_mod.make_lin_train_step(dtype),
            dataset=dataset,
            cfg=cfg,
            ckpt_dir=args.lin_ckpt,
            log_dir=dirs["tensorboard"],
            batch_to_args=lambda b: (
                b["ldr"],
                b["clipped_hdr_t"],
                b["mask"],
                b["invcrf"],
            ),
            image_taps=(),
            mesh=mesh,
        )
    if args.hal:
        state = init_net_state(HallucinationNet(), rng, sample, args.lr)
        dirs = create_run_dirs(os.getcwd(), "hal")
        vgg = Vgg16Features(npy_path=args.vgg_ckpt)
        run_synth_training(
            module_name="hal",
            state=state,
            step_fn=steps_mod.make_hal_train_step(vgg, dtype),
            dataset=dataset,
            cfg=cfg,
            ckpt_dir=args.hal_ckpt,
            log_dir=dirs["tensorboard"],
            batch_to_args=lambda b: (b["hdr_t"], b["clipped_hdr_t"], b["mask"]),
            image_taps=("y_final",),
            mesh=mesh,
        )


if __name__ == "__main__":
    run(build_parser().parse_args())
