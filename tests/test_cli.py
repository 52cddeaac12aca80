"""End-to-end CLI tests: tiny synthetic data through every driver."""

import glob
import os

import numpy as np
import pytest

from singlehdr_tpu.data.hdr_io import write_hdr


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    """A small tree of .hdr files for HDR-Synth-style training."""
    root = str(tmp_path_factory.mktemp("synth"))
    rng = np.random.RandomState(0)
    for i in range(22):
        img = (rng.rand(64, 64, 3).astype(np.float32) * 4) ** 2
        big = np.kron(img, np.ones((8, 8, 1), np.float32))  # 512x512
        write_hdr(os.path.join(root, f"s{i:02d}.hdr"), big)
    return root


@pytest.fixture(scope="module")
def real_dir(tmp_path_factory):
    """Paired HDR_gt/LDR_in tree for the record converter."""
    import cv2

    root = str(tmp_path_factory.mktemp("real"))
    os.makedirs(os.path.join(root, "HDR_gt"))
    os.makedirs(os.path.join(root, "LDR_in"))
    rng = np.random.RandomState(1)
    for i in range(2):
        hdr = rng.rand(300, 300, 3).astype(np.float32)
        ldr = (np.clip(hdr, 0, 1) * 200 + 20).astype(np.uint8)
        write_hdr(os.path.join(root, "HDR_gt", f"{i}.hdr"), hdr)
        cv2.imwrite(os.path.join(root, "LDR_in", f"{i}.jpg"), ldr[:, :, ::-1])
    return root


def test_convert_records_cli(real_dir, tmp_path):
    from singlehdr_tpu.cli import convert_records

    out = str(tmp_path / "records")
    args = convert_records.build_parser().parse_args(["--dir", real_dir, "--out", out])
    convert_records.run(args)
    shards = glob.glob(os.path.join(out, "*.shdrec"))
    assert shards
    from singlehdr_tpu.data.records import RecordDataset

    ds = RecordDataset(out)
    assert len(ds) > 0
    hdr, ldr = ds[0]
    assert hdr.shape == (256, 256, 3) and ldr.dtype == np.uint8


def test_train_cli_deq_two_iterations(synth_dir, tmp_path, monkeypatch):
    from singlehdr_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    args = train_cli.build_parser().parse_args(
        [
            "--hdrdir", synth_dir,
            "--deq", "true",
            "--deq_ckpt", str(tmp_path / "ck_deq"),
            "--batch_size", "2",
            "--iterations", "2",
            "--jpeg", "false",
            "--workers", "2",
            "--patch_size", "64",
        ]
    )
    train_cli.run(args)
    # checkpoint written
    assert os.path.isdir(str(tmp_path / "ck_deq"))
    assert glob.glob(str(tmp_path / "ck_deq" / "*"))


def test_train_cli_deq_data_parallel_mesh(synth_dir, tmp_path, monkeypatch):
    """Two iterations on an 8-way data mesh (virtual CPU devices)."""
    from singlehdr_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    args = train_cli.build_parser().parse_args(
        [
            "--hdrdir", synth_dir,
            "--deq", "true",
            "--deq_ckpt", str(tmp_path / "ck_deq_dp"),
            "--batch_size", "8",
            "--iterations", "2",
            "--jpeg", "false",
            "--workers", "2",
            "--patch_size", "64",
            "--mesh", "4,2",
        ]
    )
    train_cli.run(args)
    assert glob.glob(str(tmp_path / "ck_deq_dp" / "*"))


def test_validate_synth_cli(synth_dir, tmp_path, monkeypatch):
    from singlehdr_tpu.cli import validate_synth

    monkeypatch.chdir(tmp_path)
    args = validate_synth.build_parser().parse_args(
        [
            "--hdrdir", synth_dir,
            "--deq_ckpt", str(tmp_path / "no_deq"),
            "--lin_ckpt", str(tmp_path / "no_lin"),
            "--batch_size", "2",
            "--batches", "2",
            "--size", "64",
        ]
    )
    results = validate_synth.run(args)
    assert np.isfinite(results["deq_psnr"])
    assert results["crf_mse"] >= 0.0


def test_joint_cli_one_iteration(synth_dir, tmp_path, monkeypatch):
    from singlehdr_tpu.cli import joint_train

    monkeypatch.chdir(tmp_path)
    args = joint_train.build_parser().parse_args(
        [
            "--dir", synth_dir,
            "--jnt_ckpt", str(tmp_path / "ck_jnt"),
            "--deq_ckpt", str(tmp_path / "ck_deq"),
            "--lin_ckpt", str(tmp_path / "ck_lin"),
            "--hal_ckpt", str(tmp_path / "ck_hal"),
            "--batch_size", "2",
            "--iterations", "1",
            "--jpeg", "false",
            "--workers", "2",
            "--patch_size", "64",
        ]
    )
    joint_train.run(args)
    assert glob.glob(str(tmp_path / "ck_jnt" / "*"))


def test_finetune_and_infer_cli(real_dir, tmp_path, monkeypatch):
    import cv2

    from singlehdr_tpu.cli import convert_records, finetune, infer

    monkeypatch.chdir(tmp_path)
    records = str(tmp_path / "records")
    convert_records.run(
        convert_records.build_parser().parse_args(
            ["--dir", real_dir, "--out", records, "--patch_size", "64", "--patch_stride", "64"]
        )
    )

    args = finetune.build_parser().parse_args(
        [
            "--records", records,
            "--deq_ckpt", str(tmp_path / "ck_deq"),
            "--lin_ckpt", str(tmp_path / "ck_lin"),
            "--hal_ckpt", str(tmp_path / "ck_hal"),
            "--ref_ckpt", str(tmp_path / "ck_ref"),
            "--batch_size", "2",
            "--epochs", "1",
        ]
    )
    finetune.run(args)
    assert glob.glob(str(tmp_path / "ck_ref" / "*"))

    # inference over a tiny jpg dir using the finetuned ref checkpoint
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    cv2.imwrite(
        os.path.join(in_dir, "img.jpg"),
        (np.random.RandomState(3).rand(100, 140, 3) * 255).astype(np.uint8),
    )
    out_dir = str(tmp_path / "out")
    # the finetune checkpoint holds all four nets; point every slot at it
    iargs = infer.build_parser().parse_args(
        [
            "--dir", in_dir,
            "--output_path", out_dir,
            "--deq_ckpt", str(tmp_path / "ck_ref"),
            "--lin_ckpt", str(tmp_path / "ck_ref"),
            "--hal_ckpt", str(tmp_path / "ck_ref"),
            "--ref_ckpt", str(tmp_path / "ck_ref"),
        ]
    )
    infer.run(iargs)
    outs = glob.glob(os.path.join(out_dir, "*.hdr"))
    assert len(outs) == 1
    from singlehdr_tpu.data.hdr_io import read_hdr

    hdr = read_hdr(outs[0])
    assert hdr.shape == (100, 140, 3)
    assert np.isfinite(hdr).all()

    # evaluation CLI over the same records + checkpoint
    from singlehdr_tpu.cli import evaluate

    eargs = evaluate.build_parser().parse_args(
        [
            "--records", records,
            "--deq_ckpt", str(tmp_path / "ck_ref"),
            "--lin_ckpt", str(tmp_path / "ck_ref"),
            "--hal_ckpt", str(tmp_path / "ck_ref"),
            "--ref_ckpt", str(tmp_path / "ck_ref"),
            "--batch_size", "2",
            "--max_batches", "2",
        ]
    )
    results = evaluate.run(eargs)
    assert np.isfinite(results["psnr_mu_db"])
    assert 0.0 <= results["ssim_mu"] <= 1.0
