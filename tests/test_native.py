"""Native C++ batch JPEG codec tests (skipped when the library isn't built)."""

import numpy as np
import pytest

from singlehdr_tpu.data import native_jpeg

pytestmark = pytest.mark.skipif(
    not native_jpeg.available(), reason="native codec not built (make -C native)"
)


def _batch(rng, b=4, s=128):
    grad = np.linspace(0, 220, s, dtype=np.float32)
    img = grad[None, :, None, None] + grad[None, None, :, None] / 3
    img = img + rng.rand(b, s, s, 3).astype(np.float32) * 12
    return np.clip(img, 0, 255).astype(np.uint8)


def test_native_matches_cv2_bit_exact(rng):
    from singlehdr_tpu.data.jpeg import _roundtrip_one

    img = _batch(rng)
    qs = [90, 93, 97, 100]
    nat = native_jpeg.jpeg_roundtrip_batch_native(img, qs)
    cv = np.stack([_roundtrip_one(img[i], qs[i]) for i in range(len(qs))])
    np.testing.assert_array_equal(nat, cv)  # same libjpeg, same colorspace


def test_native_quality_ordering(rng):
    img = _batch(rng, b=2)
    out = native_jpeg.jpeg_roundtrip_batch_native(img, [80, 100])
    e_low = np.abs(out[0].astype(np.float32) - img[0].astype(np.float32)).mean()
    e_high = np.abs(out[1].astype(np.float32) - img[1].astype(np.float32)).mean()
    assert e_high < e_low


def test_native_rejects_bad_input(rng):
    img = _batch(rng, b=2)
    with pytest.raises(ValueError):
        native_jpeg.jpeg_roundtrip_batch_native(img, [90])
    with pytest.raises(TypeError):
        native_jpeg.jpeg_roundtrip_batch_native(img.astype(np.float32), [90, 90])


def test_dispatch_prefers_native(rng):
    from singlehdr_tpu.data.jpeg import jpeg_roundtrip_batch

    img = _batch(rng, b=2)
    out = jpeg_roundtrip_batch(img, [90, 95])
    nat = native_jpeg.jpeg_roundtrip_batch_native(img, [90, 95])
    np.testing.assert_array_equal(out, nat)
