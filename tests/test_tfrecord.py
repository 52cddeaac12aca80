"""Reference-format GZIP TFRecord interop (data/tfrecord.py).

Pure-Python round-trip here; the cross-validation against real TF's writer
and reader lives in test_tf_parity.py (TF-gated).  Reference format:
convert_to_tf_record.py:7,12-14,44-48,60-65 / finetune_real_dataset.py:34-48.
"""

import numpy as np
import pytest

from singlehdr_tpu.data.tfrecord import (
    TfrecordExampleDataset,
    build_example,
    crc32c,
    iter_tfrecord,
    masked_crc,
    parse_example,
    write_reference_shards,
    write_tfrecord,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_example_proto_roundtrip():
    feats = {"ref_HDR": b"\x00\x01\x02hdr", "ref_LDR": b"ldr\xff"}
    parsed = parse_example(build_example(feats))
    assert parsed == feats


def test_tfrecord_framing_roundtrip(tmp_path):
    payloads = [b"a" * 10, b"", b"payload-three"]
    for compress in (True, False):
        p = str(tmp_path / f"t_{compress}.tfrecords")
        write_tfrecord(p, payloads, compress=compress)
        assert list(iter_tfrecord(p, verify=True)) == payloads


def test_framing_detects_desync(tmp_path):
    p = str(tmp_path / "bad.tfrecords")
    write_tfrecord(p, [b"hello"], compress=False)
    raw = bytearray(open(p, "rb").read())
    raw[0] ^= 0xFF  # corrupt the length
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        list(iter_tfrecord(p))


def test_reference_shard_dataset(tmp_path):
    rng = np.random.RandomState(0)
    pairs = [
        (
            rng.rand(8, 8, 3).astype(np.float32) * 4,
            (rng.rand(8, 8, 3) * 255).astype(np.uint8),
        )
        for _ in range(7)
    ]
    paths = write_reference_shards(
        str(tmp_path), pairs, records_per_shard=3
    )
    assert len(paths) == 3  # 3+3+1
    ds = TfrecordExampleDataset(str(tmp_path), shape=(8, 8, 3))
    assert len(ds) == 7
    for i, (hdr, ldr) in enumerate(pairs):
        got_hdr, got_ldr = ds[i]
        np.testing.assert_array_equal(got_hdr, hdr)
        np.testing.assert_array_equal(got_ldr, ldr)
        assert got_ldr.dtype == np.uint8
    with pytest.raises(IndexError):
        ds[7]


def test_finetune_pipeline_reads_reference_shards(tmp_path):
    """HdrRealPipeline consumes a directory of reference-format shards
    directly (the backend auto-detects *.tfrecords)."""
    from singlehdr_tpu.data.real import HdrRealPipeline

    rng = np.random.RandomState(1)
    pairs = [
        (
            rng.rand(16, 16, 3).astype(np.float32) * 4,
            (rng.rand(16, 16, 3) * 255).astype(np.uint8),
        )
        for _ in range(5)
    ]
    write_reference_shards(str(tmp_path), pairs, records_per_shard=4)
    pipe = HdrRealPipeline(str(tmp_path), batch_size=2, seed=0)
    batches = list(pipe.epoch())
    assert sum(b[0].shape[0] for b in batches) == 5
    for ldr, hdr in batches:
        assert ldr.dtype == np.float32 and ldr.max() <= 1.0
        assert np.isfinite(hdr).all()
        # HDR renormalized to mean 0.5 per sample (finetune_real_dataset.py:47)
        np.testing.assert_allclose(
            hdr.reshape(hdr.shape[0], -1).mean(1), 0.5, atol=1e-3
        )
