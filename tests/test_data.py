import os

import numpy as np
import pytest

from singlehdr_tpu.data import hdr_io, records
from singlehdr_tpu.data.datasets import (
    ArrayDataset,
    CachedDataset,
    ProductDataset,
    ZipDataset,
)
from singlehdr_tpu.data.loader import RandomSampleLoader
from singlehdr_tpu.data.real import HdrRealPipeline
from singlehdr_tpu.data.jpeg import jpeg_roundtrip_batch


# ------------------------------------------------------------------ hdr io


def _assert_rgbe_close(dec, img, steps=1.0):
    """RGBE precision: 8-bit mantissa steps at the pixel's shared exponent."""
    step = img.max(axis=-1, keepdims=True) / 256.0
    assert np.all(np.abs(dec - img) <= steps * step + 1e-6)


def test_rgbe_codec_roundtrip(rng):
    img = (rng.rand(16, 20, 3).astype(np.float32) * 8.0) ** 2
    dec = hdr_io.rgbe_decode(hdr_io.rgbe_encode(img))
    _assert_rgbe_close(dec, img)


def test_hdr_file_roundtrip(tmp_path, rng):
    img = rng.rand(32, 48, 3).astype(np.float32) * 4.0
    path = str(tmp_path / "x.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    assert back.shape == img.shape
    _assert_rgbe_close(back, img, steps=2.0)  # cv2's encoder quantizes coarser


def test_numpy_rgbe_reader_parses_cv2_written_file(tmp_path, rng):
    img = rng.rand(24, 24, 3).astype(np.float32)
    path = str(tmp_path / "y.hdr")
    hdr_io.write_hdr(path, img)
    parsed = hdr_io._read_rgbe(path)  # exercise the pure-numpy path explicitly
    cv2_read = hdr_io.read_hdr(path)
    np.testing.assert_allclose(parsed, cv2_read, rtol=1e-6)  # matches cv2's decode
    _assert_rgbe_close(parsed, img, steps=2.0)


# ------------------------------------------------------------------ datasets


def test_zip_and_product_datasets():
    a = ArrayDataset(np.arange(3))
    b = ArrayDataset(np.arange(3) * 10)
    z = ZipDataset([a, b])
    assert len(z) == 3
    assert z[1] == (1, 10)

    c = ArrayDataset(np.arange(4) * 100)
    p = ProductDataset([z, c])
    assert len(p) == 12
    # idx decomposition: idx=5 -> z[5 % 3], c[5 // 3]
    assert p[5] == (2, 20, 100)
    with pytest.raises(IndexError):
        p[12]


def test_cached_dataset_counts_loads():
    calls = []

    class Counting:
        def __getitem__(self, i):
            calls.append(i)
            return i * 2

        def __len__(self):
            return 5

    ds = CachedDataset(Counting())
    assert ds[3] == 6
    assert ds[3] == 6
    assert calls == [3]


# ------------------------------------------------------------------- records


def test_record_write_read_roundtrip(tmp_path, rng):
    out = str(tmp_path / "recs")
    with records.RecordWriter(out, shard_records=4) as w:
        items = []
        for _ in range(10):
            hdr = rng.rand(32, 32, 3).astype(np.float32)
            ldr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            w.write(hdr, ldr)
            items.append((hdr, ldr))
    # 10 records over shards of 4 -> 3 shards
    assert len([f for f in os.listdir(out) if f.endswith(".shdrec")]) == 3
    ds = records.RecordDataset(out)
    assert len(ds) == 10
    for i in (0, 3, 4, 9):
        hdr, ldr = ds[i]
        np.testing.assert_array_equal(hdr, items[i][0])
        np.testing.assert_array_equal(ldr, items[i][1])


def test_patch_origins_cover_borders():
    origins = list(records.iter_patch_origins(300, 520, size=256, stride=64))
    # interior grid: y in {0}, x in {0,64,128,192,256(?)} -> x <= 264
    assert (0, 0) in origins
    assert (44, 0) in origins  # bottom border row (300 % 256 != 0)
    assert (0, 264) in origins  # right border col (520 % 256 != 0)
    assert (44, 264) in origins  # corner
    ys = {o[0] for o in origins}
    xs = {o[1] for o in origins}
    assert max(ys) + 256 == 300 and max(xs) + 256 == 520


def test_patch_informative_filter():
    bright = np.full((256, 256, 3), 255, np.uint8)
    mid = np.full((256, 256, 3), 128, np.uint8)
    assert not records.patch_is_informative(bright)
    assert records.patch_is_informative(mid)


def test_hdr_real_pipeline(tmp_path, rng):
    out = str(tmp_path / "recs")
    with records.RecordWriter(out, shard_records=4) as w:
        for _ in range(6):
            w.write(
                rng.rand(32, 32, 3).astype(np.float32) * 3,
                (rng.rand(32, 32, 3) * 255).astype(np.uint8),
            )
    pipe = HdrRealPipeline(out, batch_size=4, training=True)
    batches = list(pipe.epoch())
    assert len(batches) == 2
    ldr, hdr = batches[0]
    assert ldr.shape == (4, 32, 32, 3) and hdr.shape == (4, 32, 32, 3)
    assert ldr.max() <= 1.0
    np.testing.assert_allclose(hdr.mean(axis=(1, 2, 3)), 0.5, atol=1e-3)
    # last batch short (drop_remainder=False semantics)
    assert batches[1][0].shape[0] == 2


# -------------------------------------------------------------------- loader


def test_random_sample_loader_batches():
    ds = ArrayDataset(np.arange(50, dtype=np.float32).reshape(50, 1))
    with RandomSampleLoader(
        ZipDataset([ds, ds]), batch_size=8, n_workers=2, seed=3
    ) as loader:
        batch = loader.read_batch()
    assert len(batch) == 2
    assert batch[0].shape == (8, 1)
    np.testing.assert_array_equal(batch[0], batch[1])


# ---------------------------------------------------------------------- jpeg


def test_jpeg_roundtrip_batch(rng):
    # smooth gradient + mild noise (JPEG-friendly, like real LDR content)
    grad = np.linspace(0, 200, 64, dtype=np.float32)
    img = grad[None, :, None, None] + grad[None, None, :, None] / 4
    img = img + rng.rand(3, 64, 64, 3).astype(np.float32) * 10
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = jpeg_roundtrip_batch(img, [90, 95, 100])
    assert out.shape == img.shape and out.dtype == np.uint8
    # lossy but close; higher quality -> smaller error
    errs = [
        float(np.mean(np.abs(out[i].astype(np.float32) - img[i].astype(np.float32))))
        for i in range(3)
    ]
    assert errs[2] <= errs[0]
    assert errs[0] < 8.0


def test_jpeg_quality_ladder():
    from singlehdr_tpu.ops.degradation import jpeg_quality_ladder

    assert jpeg_quality_ladder(16)[0] == 90
    assert jpeg_quality_ladder(16)[-1] == 100
    assert jpeg_quality_ladder(2) == [90, 100]
    assert jpeg_quality_ladder(1) == [90]
