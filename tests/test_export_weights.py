"""Consolidated-weights export/load round trip and CLI wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.models import ReverseCameraPipeline
from singlehdr_tpu.train.weight_import import (
    load_variables_npz,
    save_variables_npz,
)


def test_npz_roundtrip_preserves_pipeline_output(tmp_path, rng):
    ldr = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pipe = ReverseCameraPipeline()
    variables = pipe.init(jax.random.PRNGKey(0), ldr)
    want = np.asarray(pipe.apply(variables, ldr).hdr)

    path = str(tmp_path / "pipeline.npz")
    n = save_variables_npz(variables, path)
    assert n > 100  # all four nets' arrays

    restored = load_variables_npz(path)
    got = np.asarray(pipe.apply(restored, ldr).hdr)
    np.testing.assert_array_equal(got, want)


def test_export_cli_and_weights_flag(tmp_path, rng, monkeypatch):
    import cv2

    from singlehdr_tpu.cli import export_weights, infer

    monkeypatch.chdir(tmp_path)
    out_npz = str(tmp_path / "w.npz")
    export_weights.run(
        export_weights.build_parser().parse_args(
            [
                "--out", out_npz,
                "--deq_ckpt", str(tmp_path / "none1"),
                "--lin_ckpt", str(tmp_path / "none2"),
                "--hal_ckpt", str(tmp_path / "none3"),
                "--ref_ckpt", str(tmp_path / "none4"),
            ]
        )
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cv2.imwrite(
        str(in_dir / "x.jpg"), (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    )
    infer.run(
        infer.build_parser().parse_args(
            [
                "--dir", str(in_dir),
                "--output_path", str(tmp_path / "out"),
                "--weights", out_npz,
            ]
        )
    )
    assert (tmp_path / "out" / "x.hdr").exists()
