"""Import reference (TF2 SingleHDR-tf2) checkpoints into deployment weights.

  python -m singlehdr_tpu.cli.import_reference --out pipeline.npz \
      --deq /path/deq_ckpt/ckpt-40 --lin ... --hal ... --ref ... \
      [--channel_order bgr]

Each ``--<net>`` is a raw ``tf.train.Checkpoint`` prefix (``<prefix>.index``
+ ``<prefix>.data-*`` as written by the reference's checkpoint manager,
tf_utils.py:149-169) — read natively by the pure-Python TensorBundle parser,
no TensorFlow required — or an .npz dump from tools/dump_tf_checkpoint.py.

``--channel_order bgr`` applies the exact weight permutation for checkpoints
trained on the reference's cv2-BGR synth path (dataset.py:182-184) so they
run correctly on this framework's RGB pipeline (train.weight_import.
adapt_channel_order).

The output .npz loads via ``--weights`` on the infer/evaluate/serve CLIs and
converts onward to Orbax checkpoints through normal training saves.  Nets
without a supplied checkpoint stay at their (seeded) init values and are
reported.
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
from singlehdr_tpu.train.state import init_multi_state
from singlehdr_tpu.train.weight_import import (
    import_net_weights,
    save_variables_npz,
)

NETS = ("deq", "lin", "hal", "ref")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert reference TF2 checkpoints to deployment .npz"
    )
    p.add_argument("--out", type=str, required=True)
    for net in NETS:
        p.add_argument(
            f"--{net}", type=str, default=None,
            help=f"reference checkpoint prefix or .npz dump for {net}",
        )
    p.add_argument(
        "--channel_order", choices=("rgb", "bgr"), default="rgb",
        help="channel order the checkpoint was trained with",
    )
    return p


def run(args) -> None:
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
        "ref": RefinementNet(),
    }
    samples = {**{n: sample for n in NETS},
               "ref": jnp.zeros((1, 64, 64, 9), jnp.float32)}
    state = init_multi_state(modules, samples, jax.random.PRNGKey(0), 1e-5)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for net in NETS:
        path = getattr(args, net)
        if not path:
            print(f"{net}: no checkpoint supplied — left at init")
            continue
        target = {"params": params[net], "batch_stats": stats.get(net, {})}
        out = import_net_weights(net, path, target, channel_order=args.channel_order)
        s = out.pop("_import_stats")
        params[net] = out["params"]
        stats[net] = out["batch_stats"]
        print(f"{net}: imported {s['imported']} arrays, {s['kept']} kept at init")
        if s["kept"]:
            print(f"  WARNING: {s['kept']} arrays missing from {path}")
    n = save_variables_npz({"params": params, "batch_stats": stats}, args.out)
    print(f"wrote {n} arrays ({os.path.getsize(args.out) / 1e6:.1f} MB) to {args.out}")


if __name__ == "__main__":
    run(build_parser().parse_args())
