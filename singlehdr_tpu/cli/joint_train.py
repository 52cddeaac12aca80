"""Joint deq+lin+hal training CLI on HDR-Synth (reference joint_training.py).

Restores per-net pretraining checkpoints, then trains all three nets under a
single Adam(1e-5) (joint_training.py:89,185-186) with the joint weighting
(10x lin L2 + crf MSE).

  python -m singlehdr_tpu.cli.joint_train --dir /data/HDR-Synth
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
from singlehdr_tpu.train.checkpoint import restore_pretrained_subnets
from singlehdr_tpu.train.loop import LoopConfig, run_synth_training
from singlehdr_tpu.train.state import init_multi_state
from singlehdr_tpu.train.steps import make_joint_train_step
from singlehdr_tpu.utils import create_run_dirs, str2bool

LEARNING_RATE = 1e-5  # joint_training.py:20
BATCH_SIZE = 16       # joint_training.py:21


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Joint deq+lin+hal training")
    p.add_argument("--dir", type=str, required=True)
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--jnt_ckpt", type=str, default=os.path.join(cwd, "checkpoints/jnt"))
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
    cfg = LoopConfig(
        batch_size=args.batch_size,
        iterations=args.iterations,
        use_jpeg=args.jpeg,
        n_workers=args.workers,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
    )
    dataset = get_train_dataset(args.dir, patch_size=args.patch_size)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)  # init shape-agnostic
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
    }
    state = init_multi_state(
        modules,
        {k: sample for k in modules},
        jax.random.PRNGKey(0),
        args.lr,
    )
    state = restore_pretrained_subnets(
        state,
        {"deq": args.deq_ckpt, "lin": args.lin_ckpt, "hal": args.hal_ckpt},
        args.lr,
    )
    vgg = Vgg16Features(npy_path=args.vgg_ckpt)
    dirs = create_run_dirs(os.getcwd(), "jnt")
    run_synth_training(
        module_name="jnt",
        state=state,
        step_fn=make_joint_train_step(vgg, jnp.dtype(args.dtype), remat=args.remat),
        dataset=dataset,
        cfg=cfg,
        ckpt_dir=args.jnt_ckpt,
        log_dir=dirs["tensorboard"],
        batch_to_args=lambda b: (
            b["ldr"],
            b["jpeg"],
            b["clipped_hdr_t"],
            b["hdr_t"],
            b["mask"],
            b["invcrf"],
        ),
        image_taps=("c_pred", "b_pred", "a_pred", "alpha"),
        mesh=_parse_mesh(args.mesh),
    )


if __name__ == "__main__":
    run(build_parser().parse_args())
