"""Tests for the pure-Python TensorBundle reader/writer.

The byte-level cases are hand-assembled from the public format specs
(leveldb doc/table_format.md, TF tensor_bundle.proto) rather than produced by
this repo's writer, so reader and writer cannot co-drift undetected.
"""

import struct

import numpy as np
import pytest

from singlehdr_tpu.train import tensorbundle as tb


def test_crc32c_known_vectors():
    # canonical CRC-32C check value
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"") == 0
    # 32 bytes of zeros (rfc3720 appendix B.4 test vector)
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masking_matches_leveldb_definition():
    c = tb.crc32c(b"hello")
    masked = tb.masked_crc32c(b"hello")
    assert masked == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _raw_block(entries):
    """Assemble a leveldb block by hand: no prefix sharing, one restart."""
    body = b""
    for key, value in entries:
        body += bytes([0]) + bytes([len(key)]) + bytes([len(value)])
        body += key + value
    body += struct.pack("<I", 0)  # restart offset 0
    body += struct.pack("<I", 1)  # num_restarts
    return body


def _stored_block(out, contents):
    offset = len(out)
    out += contents + b"\x00"
    out += struct.pack("<I", tb.masked_crc32c(contents + b"\x00"))
    return bytes([offset]) + bytes([len(contents)])  # 1-byte varints


def test_handcrafted_table_parses():
    out = bytearray()
    data_handle = _stored_block(out, _raw_block([(b"alpha", b"1"), (b"beta", b"22")]))
    meta_handle = _stored_block(out, _raw_block([]))
    index_handle = _stored_block(out, _raw_block([(b"zz", data_handle)]))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", tb.TABLE_MAGIC)
    out += footer
    entries = tb.read_table(bytes(out))
    assert entries == [(b"alpha", b"1"), (b"beta", b"22")]


def test_prefix_compressed_keys():
    # shared=3 on the second key: "abcXY" after "abcde"
    body = b"\x00\x05\x01abcdeV"
    body += b"\x03\x02\x01XYW"
    body += struct.pack("<I", 0) + struct.pack("<I", 1)
    entries = tb._block_entries(body)
    assert entries == [(b"abcde", b"V"), (b"abcXY", b"W")]


def test_table_crc_detects_corruption():
    out = bytearray()
    data_handle = _stored_block(out, _raw_block([(b"k", b"v")]))
    meta_handle = _stored_block(out, _raw_block([]))
    index_handle = _stored_block(out, _raw_block([(b"z", data_handle)]))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer)) + struct.pack("<Q", tb.TABLE_MAGIC)
    out += footer
    out[2] ^= 0xFF  # flip a byte inside the data block
    with pytest.raises(ValueError, match="crc"):
        tb.read_table(bytes(out))
    assert tb.read_table(bytes(out), verify_crc=False)  # tolerated when off


def test_bundle_entry_proto_roundtrip_and_handmade_bytes():
    # hand-encoded BundleEntryProto: dtype=DT_FLOAT(1), shape [2,3],
    # shard_id=0, offset=24, size=24, crc32c=0xdeadbeef
    dim2 = b"\x08\x02"      # Dim.size=2
    dim3 = b"\x08\x03"
    shape = (
        b"\x12" + bytes([len(dim2)]) + dim2 + b"\x12" + bytes([len(dim3)]) + dim3
    )
    buf = (
        b"\x08\x01"                                  # dtype=1
        + b"\x12" + bytes([len(shape)]) + shape      # shape
        + b"\x20\x18"                                # offset=24
        + b"\x28\x18"                                # size=24
        + b"\x35\xef\xbe\xad\xde"                    # crc32c fixed32
    )
    e = tb.BundleEntry.parse(buf)
    assert e.dtype == 1 and e.shape == (2, 3)
    assert e.offset == 24 and e.size == 24 and e.crc32c == 0xDEADBEEF
    e2 = tb.BundleEntry.parse(e.serialize())
    assert (e2.dtype, e2.shape, e2.offset, e2.size, e2.crc32c) == (
        1, (2, 3), 24, 24, 0xDEADBEEF,
    )


def test_snappy_literal_and_copies():
    # literal "abcd", then copy len=4 offset=4 (repeats "abcd"),
    # preamble: uncompressed length 8
    data = b"\x08" + b"\x0c" + b"abcd" + b"\x01\x04"
    # tag 0x01: kind=1, len=((0>>0)&7)+4 = 4, offset=(0<<8)|4
    assert tb.snappy_decompress(data) == b"abcdabcd"
    # overlapping copy: "ab" then copy len 6 offset 2 -> "abababab"
    data = b"\x08" + b"\x04" + b"ab" + bytes([(2 << 2) | 1, 2])
    assert tb.snappy_decompress(data) == b"abababab"


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "lin/conv1/kernel/.ATTRIBUTES/VARIABLE_VALUE": rng.randn(7, 7, 3, 16).astype(np.float32),
        "lin/conv1/bias/.ATTRIBUTES/VARIABLE_VALUE": rng.randn(16).astype(np.float32),
        "epoch/.ATTRIBUTES/VARIABLE_VALUE": np.asarray(5.0, np.float32),
        "save_counter/.ATTRIBUTES/VARIABLE_VALUE": np.asarray(7, np.int64),
        "flags": np.asarray([True, False]),
        "small_int": np.arange(6, dtype=np.int32).reshape(2, 3),
    }
    prefix = str(tmp_path / "ckpt-1")
    tb.write_bundle(prefix, tensors)
    back = tb.read_bundle(prefix)
    assert set(back) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(back[k], v)
        assert back[k].dtype == v.dtype
    reader = tb.BundleReader(prefix)
    assert reader.variable_to_shape_map()["small_int"] == (2, 3)
    assert reader.header["num_shards"] == 1


def test_many_keys_exercises_restarts(tmp_path):
    # >16 keys forces multiple restart intervals in the block builder
    tensors = {f"k{i:03d}": np.full((i + 1,), i, np.float32) for i in range(50)}
    prefix = str(tmp_path / "many")
    tb.write_bundle(prefix, tensors)
    back = tb.read_bundle(prefix)
    assert len(back) == 50
    np.testing.assert_array_equal(back["k049"], np.full((50,), 49, np.float32))


def test_varints():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**40):
        enc = tb._write_varint(v)
        dec, pos = tb._read_varint(enc, 0)
        assert dec == v and pos == len(enc)
