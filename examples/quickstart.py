#!/usr/bin/env python
"""Quickstart: synthesize a tiny HDR dataset, train briefly, infer, evaluate.

Runs end-to-end on whatever backend jax picks (TPU if attached, CPU otherwise)
in a few minutes at toy sizes:

    python examples/quickstart.py --workdir /tmp/shdr_quickstart
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/shdr_quickstart")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    from singlehdr_tpu.cli import convert_records, finetune, infer, train
    from singlehdr_tpu.data.hdr_io import write_hdr

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    # --- 1. toy HDR-Synth scene tree
    synth = os.path.join(args.workdir, "synth")
    os.makedirs(synth, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(22):
        base = (rng.rand(64, 64, 3).astype(np.float32) * 4) ** 2
        write_hdr(
            os.path.join(synth, f"s{i:02d}.hdr"),
            np.kron(base, np.ones((8, 8, 1), np.float32)),
        )
    print(f"[1/4] wrote toy HDR-Synth tree -> {synth}")

    # --- 2. pretrain the Dequantization-Net for a few steps
    train.run(
        train.build_parser().parse_args(
            [
                "--hdrdir", synth,
                "--deq", "true",
                "--deq_ckpt", os.path.join(args.workdir, "ck_deq"),
                "--batch_size", "4",
                "--iterations", str(args.steps),
                "--patch_size", "64",
                "--log_every", "5",
                "--ckpt_every", str(args.steps),
                "--workers", "4",
            ]
        )
    )
    print("[2/4] deq pretraining done")

    # --- 3. toy HDR-Real records + one finetune epoch
    import cv2

    real = os.path.join(args.workdir, "real")
    os.makedirs(os.path.join(real, "HDR_gt"), exist_ok=True)
    os.makedirs(os.path.join(real, "LDR_in"), exist_ok=True)
    for i in range(2):
        hdr = rng.rand(192, 192, 3).astype(np.float32)
        write_hdr(os.path.join(real, "HDR_gt", f"{i}.hdr"), hdr)
        cv2.imwrite(
            os.path.join(real, "LDR_in", f"{i}.jpg"),
            (np.clip(hdr, 0, 1) * 220)[:, :, ::-1].astype(np.uint8),
        )
    records = os.path.join(args.workdir, "records")
    convert_records.run(
        convert_records.build_parser().parse_args(
            ["--dir", real, "--out", records, "--patch_size", "64", "--patch_stride", "64"]
        )
    )
    finetune.run(
        finetune.build_parser().parse_args(
            [
                "--records", records,
                "--deq_ckpt", os.path.join(args.workdir, "ck_deq"),
                "--lin_ckpt", os.path.join(args.workdir, "ck_lin"),
                "--hal_ckpt", os.path.join(args.workdir, "ck_hal"),
                "--ref_ckpt", os.path.join(args.workdir, "ck_ref"),
                "--batch_size", "2",
                "--epochs", "1",
            ]
        )
    )
    print("[3/4] finetune epoch done")

    # --- 4. inference over a test image
    test_in = os.path.join(args.workdir, "test_in")
    os.makedirs(test_in, exist_ok=True)
    cv2.imwrite(
        os.path.join(test_in, "photo.jpg"),
        (rng.rand(100, 140, 3) * 255).astype(np.uint8),
    )
    out_dir = os.path.join(args.workdir, "hdr_out")
    infer.run(
        infer.build_parser().parse_args(
            [
                "--dir", test_in,
                "--output_path", out_dir,
                "--deq_ckpt", os.path.join(args.workdir, "ck_ref"),
                "--lin_ckpt", os.path.join(args.workdir, "ck_ref"),
                "--hal_ckpt", os.path.join(args.workdir, "ck_ref"),
                "--ref_ckpt", os.path.join(args.workdir, "ck_ref"),
            ]
        )
    )
    print(f"[4/4] HDR written under {out_dir} — quickstart complete")


if __name__ == "__main__":
    main()
