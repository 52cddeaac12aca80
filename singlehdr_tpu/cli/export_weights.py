"""Export trained checkpoints into one deployment .npz (all four nets).

  python -m singlehdr_tpu.cli.export_weights --out pipeline.npz \
      --deq_ckpt ... --lin_ckpt ... --hal_ckpt ... --ref_ckpt ...

The artifact loads back via ``--weights pipeline.npz`` on the infer /
evaluate / serve CLIs — no orbax directory layout required at deployment.
"""

from __future__ import annotations

import argparse
import os

from singlehdr_tpu.cli import infer
from singlehdr_tpu.train.weight_import import save_variables_npz


def build_parser() -> argparse.ArgumentParser:
    cwd = os.getcwd()
    p = argparse.ArgumentParser(description="Export pipeline weights to .npz")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--deq_ckpt", type=str, default=os.path.join(cwd, "checkpoints/deq"))
    p.add_argument("--lin_ckpt", type=str, default=os.path.join(cwd, "checkpoints/lin"))
    p.add_argument("--hal_ckpt", type=str, default=os.path.join(cwd, "checkpoints/hal"))
    p.add_argument("--ref_ckpt", type=str, default=os.path.join(cwd, "checkpoints/ref"))
    p.add_argument("--weights", type=str, default=None, help=argparse.SUPPRESS)
    p.add_argument(
        "--reference_out", type=str, default=None,
        help="also write per-net TF2-format checkpoints (TensorBundle, "
             "reference key layout) under this directory as <net>/ckpt-1",
    )
    return p


def run(args) -> None:
    variables = infer.load_pipeline_variables(args)
    n = save_variables_npz(variables, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {n} arrays ({size_mb:.1f} MB) to {args.out}")
    if args.reference_out:
        from singlehdr_tpu.train.weight_import import export_reference_checkpoint

        for net in ("deq", "lin", "hal", "ref"):
            sub = {
                "params": variables["params"][net],
                "batch_stats": variables.get("batch_stats", {}).get(net, {}),
            }
            prefix = os.path.join(args.reference_out, net, "ckpt-1")
            count = export_reference_checkpoint(net, sub, prefix)
            print(f"{net}: {count} tensors -> {prefix}.index (+ data shard)")


if __name__ == "__main__":
    run(build_parser().parse_args())
