#!/usr/bin/env python
"""Continue a quality-anchor run from its checkpoints (VERDICT r2 item 8).

tools/quality_anchor.py runs the full reference recipe (pretrain -> joint ->
records -> finetune -> evaluate) from scratch; this tool resumes an existing
workdir's joint stage to more iterations (the loop restores its checkpoint
automatically), re-runs finetune from the extended joint weights into a fresh
ref dir, then re-evaluates and rewrites the QUALITY artifact.  Provenance:
QUALITY_r02.json was produced by the r2 run of quality_anchor.py (pretrain
600/stage, joint 1000) plus one ad-hoc extension pass (joint -> 2200,
finetune +3 epochs onto the old ref state) of this flow's shape.

    python tools/extend_anchor.py --workdir /tmp/anchor_full \
        --joint_iters 4500 --finetune_epochs 9 --out QUALITY_r03.json
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/anchor_full")
    p.add_argument("--joint_iters", type=int, default=4500,
                   help="total joint iterations (resumes from the checkpoint)")
    p.add_argument("--finetune_epochs", type=int, default=9,
                   help="finetune epochs (from scratch into --ref_name's dir)")
    p.add_argument("--ref_name", default="ref_ext",
                   help="finetune checkpoint dir name under the workdir; a "
                   "FRESH name makes finetune start from the extended joint "
                   "checkpoint (run_real_finetune otherwise restores the full "
                   "old state from an existing ref dir, discarding the new "
                   "joint weights); reuse a name to add epochs instead")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--out", default=os.path.join(REPO, "QUALITY_r03.json"))
    p.add_argument("--note", default="")
    args = p.parse_args()

    from quality_anchor import parse_result_line, run_stage

    W = args.workdir
    ck = lambda n: os.path.join(W, "ck_" + n)
    synth = os.path.join(W, "synth")
    records = os.path.join(W, "records")
    for path in (synth, records, ck("jnt")):
        if not os.path.isdir(path):
            raise SystemExit(f"missing {path}: run tools/quality_anchor.py first")

    t0 = time.time()
    run_stage("joint_train", [
        "--dir", synth,
        "--deq_ckpt", ck("deq"), "--lin_ckpt", ck("lin"),
        "--hal_ckpt", ck("hal"), "--jnt_ckpt", ck("jnt"),
        "--iterations", str(args.joint_iters), "--ckpt_every", "600",
        "--batch_size", str(args.batch), "--patch_size", "256",
        "--dtype", args.dtype, "--workers", str(args.workers),
        "--log_every", "100",
    ])
    print(f"[joint -> {args.joint_iters}] {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    ref = ck(args.ref_name)
    run_stage("finetune", [
        "--records", records,
        "--deq_ckpt", ck("jnt"), "--lin_ckpt", ck("jnt"),
        "--hal_ckpt", ck("jnt"), "--ref_ckpt", ref,
        "--epochs", str(args.finetune_epochs),
        "--batch_size", "4", "--dtype", args.dtype,
    ])
    print(f"[finetune {args.finetune_epochs} ep] {time.time() - t0:.0f}s",
          flush=True)

    results = parse_result_line(run_stage("evaluate", [
        "--records", records, "--prefix", "test",
        "--deq_ckpt", ref, "--lin_ckpt", ref,
        "--hal_ckpt", ref, "--ref_ckpt", ref,
        "--batch_size", "4",
    ], capture=True).stdout)
    summary = {
        "psnr_mu": results.get("psnr_mu_db"),
        "ssim_mu": results.get("ssim_mu"),
        "psnr_linear": results.get("psnr_linear_db"),
        "steps": {"joint": args.joint_iters,
                  "finetune_epochs": args.finetune_epochs},
        "note": args.note or (
            "continuation of the committed anchor run via tools/extend_anchor.py"
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
