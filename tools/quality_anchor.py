#!/usr/bin/env python
"""Quality anchor: the full reference training recipe at reduced scale.

Runs pretrain (deq/lin/hal) -> joint -> record conversion -> finetune ->
evaluate on procedurally-synthesized HDR scenes, producing a reproducible
PSNR/SSIM anchor for the trained pipeline (VERDICT r1 item 3).  The stage
sequence and loss configs mirror the reference drivers (train.py,
joint_training.py, finetune_real_dataset.py, SURVEY.md §3); only the data is
synthetic (no HDR-Synth/HDR-Real rights in this environment) and the step
counts are reduced-but-non-toy.

    python tools/quality_anchor.py --workdir /tmp/anchor --steps 1500

Writes QUALITY_r{round}.json at the repo root:
  {"psnr_mu": ..., "ssim_mu": ..., "psnr_linear": ..., "steps": {...}}
tests/test_quality_anchor.py gates on this artifact when present.
"""

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def synth_scene(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Structured HDR scene: low-frequency radiance + shapes + bright emitters.

    Gives the nets learnable structure (edges, smooth ramps, saturated
    highlight regions with plausible surroundings) rather than white noise.
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / h, xx / w
    base = np.zeros((h, w, 3), np.float32)
    # smooth illumination: a few random 2-D sinusoids per channel
    for c in range(3):
        for _ in range(4):
            fy, fx = rng.uniform(0.5, 4.0, 2)
            ph_y, ph_x = rng.uniform(0, 2 * math.pi, 2)
            base[..., c] += rng.uniform(0.1, 0.5) * (
                np.sin(2 * math.pi * fy * yy + ph_y)
                * np.sin(2 * math.pi * fx * xx + ph_x)
            )
    img = np.exp(base)  # positive, mid-range
    # matte rectangles and disks with random albedo
    for _ in range(rng.randint(6, 14)):
        cy, cx = rng.uniform(0, 1, 2)
        ry, rx = rng.uniform(0.03, 0.25, 2)
        albedo = rng.uniform(0.05, 1.5, 3).astype(np.float32)
        if rng.rand() < 0.5:
            m = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
        else:
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        img[m] = img[m] * 0.3 + albedo * rng.uniform(0.5, 2.0)
    # bright emitters (windows/lamps): the content hal must hallucinate
    for _ in range(rng.randint(1, 4)):
        cy, cx = rng.uniform(0.1, 0.9, 2)
        ry, rx = rng.uniform(0.02, 0.12, 2)
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        img[m] = rng.uniform(8.0, 60.0) * rng.uniform(0.7, 1.0, 3)
        # soft glow around the emitter
        d2 = ((yy - cy) / (3 * ry)) ** 2 + ((xx - cx) / (3 * rx)) ** 2
        img += np.exp(-4.0 * d2)[..., None] * rng.uniform(0.5, 2.0)
    return img.astype(np.float32)


def write_real_pair(rng, test_curves, hdr, hdr_path: str, jpg_path: str):
    """Render one HDR-Real-style pair: an LDR exposure of ``hdr`` through a
    held-out CRF + JPEG, like the reference's HDR-Real capture chain."""
    import cv2

    from singlehdr_tpu.data.hdr_io import write_hdr

    t = 0.5 / max(hdr.mean(), 1e-6)
    crf = test_curves[rng.randint(len(test_curves))]
    ldr_lin = np.clip(hdr * t * rng.uniform(0.7, 1.4), 0, 1)
    idx = np.clip((ldr_lin * (len(crf) - 1)), 0, len(crf) - 1)
    lo = np.floor(idx).astype(np.int32)
    hi = np.minimum(lo + 1, len(crf) - 1)
    ldr = crf[lo] * (1 - (idx - lo)) + crf[hi] * (idx - lo)
    u8 = np.clip(ldr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    write_hdr(hdr_path, hdr)
    cv2.imwrite(
        jpg_path, u8[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, int(rng.uniform(85, 100))]
    )


def make_dataset(workdir: str, n_train: int, n_test: int):
    from singlehdr_tpu.data.hdr_io import write_hdr

    rng = np.random.RandomState(7)
    synth = os.path.join(workdir, "synth")
    os.makedirs(synth, exist_ok=True)
    for i in range(n_train):
        write_hdr(os.path.join(synth, f"s{i:03d}.hdr"), synth_scene(rng, 512, 768))
    real = os.path.join(workdir, "real")
    os.makedirs(os.path.join(real, "HDR_gt"), exist_ok=True)
    os.makedirs(os.path.join(real, "LDR_in"), exist_ok=True)
    from singlehdr_tpu.calib.crf import get_crf_bank

    bank = get_crf_bank()
    test_curves = np.asarray(bank.test_crf)  # held-out curves, as HDR-Real would be
    for i in range(n_test):
        write_real_pair(
            rng, test_curves, synth_scene(rng, 512, 768),
            os.path.join(real, "HDR_gt", f"{i}.hdr"),
            os.path.join(real, "LDR_in", f"{i}.jpg"),
        )
    return synth, real



def run_stage(module: str, argv, capture: bool = False):
    """Run one CLI stage in a FRESH process.

    The training stages used to run in-process via ``cli.<mod>.run(...)``;
    after the 2026-08-18 host-image update the tunnel client degrades inside
    a long-lived process (the r3 single-process run kernel-spun for ~45 min
    at the joint stage with all prior stages' state resident — 60 GB RSS,
    4:1 system:user CPU — while a fresh process ran the same stage
    immediately).  Subprocess isolation also guarantees each stage starts
    from clean HBM (see bench.py's ladder for the same pattern).
    """
    import subprocess

    cmd = [sys.executable, "-m", f"singlehdr_tpu.cli.{module}", *argv]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=capture, text=True
    )
    if proc.returncode:
        if capture:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise SystemExit(f"{module} failed ({proc.returncode})")
    print(f"[{module}] done in {time.time() - t0:.0f}s", flush=True)
    return proc


def parse_result_line(stdout: str) -> dict:
    return json.loads(
        [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/shdr_anchor")
    p.add_argument("--steps", type=int, default=1500, help="per pretrain stage")
    p.add_argument("--joint_steps", type=int, default=1500)
    p.add_argument("--finetune_epochs", type=int, default=2)
    p.add_argument("--n_train", type=int, default=60)
    p.add_argument("--n_test", type=int, default=12)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--out", default=os.path.join(REPO, "QUALITY_r02.json"))
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--ckpt_every", type=int, default=600,
                   help="checkpoint cadence for every stage; the tunnel to "
                   "the chip drops periodically and the loops resume from "
                   "the last checkpoint, so sparse cadences lose wall-clock")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    t_all = time.time()
    synth, real = make_dataset(args.workdir, args.n_train, args.n_test)
    print(f"[data] {args.n_train} train + {args.n_test} eval scenes", flush=True)

    ck = lambda n: os.path.join(args.workdir, "ck_" + n)
    common = [
        "--batch_size", str(args.batch),
        "--patch_size", "256",
        "--dtype", args.dtype,
        "--workers", str(args.workers),
        "--log_every", "100",
    ]
    for net in ("deq", "lin", "hal"):
        t0 = time.time()
        # the JPEG round-trip only feeds the deq input (train.py:51-59); lin
        # and hal never consume it, so skip the host JPEG work for their runs
        jpeg = ["--jpeg", "true" if net == "deq" else "false"]
        run_stage("train",
            ["--hdrdir", synth, f"--{net}", "true",
             "--deq_ckpt", ck("deq"), "--lin_ckpt", ck("lin"),
             "--hal_ckpt", ck("hal"),
             "--iterations", str(args.steps),
             "--ckpt_every", str(args.ckpt_every),
             *jpeg, *common])
        print(f"[pretrain {net}] {args.steps} steps in {time.time() - t0:.0f}s",
              flush=True)

    t0 = time.time()
    run_stage("joint_train",
        ["--dir", synth,
         "--deq_ckpt", ck("deq"), "--lin_ckpt", ck("lin"),
         "--hal_ckpt", ck("hal"), "--jnt_ckpt", ck("jnt"),
         "--iterations", str(args.joint_steps),
         "--ckpt_every", str(args.ckpt_every),
         *common])
    print(f"[joint] {args.joint_steps} steps in {time.time() - t0:.0f}s", flush=True)

    records = os.path.join(args.workdir, "records")
    for prefix, lo, hi in (("train", 0, args.n_test - 4), ("test", args.n_test - 4, args.n_test)):
        sub = os.path.join(args.workdir, f"real_{prefix}")
        os.makedirs(os.path.join(sub, "HDR_gt"), exist_ok=True)
        os.makedirs(os.path.join(sub, "LDR_in"), exist_ok=True)
        for i in range(lo, hi):
            for d in ("HDR_gt", "LDR_in"):
                ext = ".hdr" if d == "HDR_gt" else ".jpg"
                src = os.path.join(real, d, f"{i}{ext}")
                dst = os.path.join(sub, d, f"{i}{ext}")
                if not os.path.exists(dst):
                    os.link(src, dst)
        run_stage("convert_records",
            ["--dir", sub, "--out", records, "--prefix", prefix,
             "--patch_size", "256", "--patch_stride", "128"])
    print("[records] converted", flush=True)

    t0 = time.time()
    run_stage("finetune",
        ["--records", records,
         "--deq_ckpt", ck("jnt"), "--lin_ckpt", ck("jnt"),
         "--hal_ckpt", ck("jnt"), "--ref_ckpt", ck("ref"),
         "--epochs", str(args.finetune_epochs),
         "--batch_size", "4", "--dtype", args.dtype])
    print(f"[finetune] {args.finetune_epochs} epochs in {time.time() - t0:.0f}s",
          flush=True)

    results = parse_result_line(run_stage("evaluate",
        ["--records", records, "--prefix", "test",
         "--deq_ckpt", ck("ref"), "--lin_ckpt", ck("ref"),
         "--hal_ckpt", ck("ref"), "--ref_ckpt", ck("ref"),
         "--batch_size", "4"], capture=True).stdout)
    summary = {
        "psnr_mu": results.get("psnr_mu_db"),
        "ssim_mu": results.get("ssim_mu"),
        "psnr_linear": results.get("psnr_linear_db"),
        "steps": {
            "pretrain_each": args.steps,
            "joint": args.joint_steps,
            "finetune_epochs": args.finetune_epochs,
        },
        "data": {"train_scenes": args.n_train, "eval_scenes": args.n_test},
        "wall_s": round(time.time() - t_all, 1),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
