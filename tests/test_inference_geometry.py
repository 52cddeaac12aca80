"""Inference geometry helpers: pad/crop round trips and the shape-bucketed
predictor (reference test_real_refinement.py:124-154 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.inference import HdrPredictor, crop_back, pad_to_multiple
from singlehdr_tpu.models import ReverseCameraPipeline


def test_pad_crop_roundtrip(rng):
    img = rng.rand(100, 130, 3).astype(np.float32)
    padded, hw = pad_to_multiple(img, 64)
    assert padded.shape[0] % 64 == 0 and padded.shape[1] % 64 == 0
    np.testing.assert_array_equal(crop_back(padded, hw), img)


def test_pad_noop_on_exact_multiple(rng):
    img = rng.rand(128, 64, 3).astype(np.float32)
    padded, hw = pad_to_multiple(img, 64)
    np.testing.assert_array_equal(padded, img)
    assert hw == (128, 64)


@pytest.fixture(scope="module")
def predictor():
    pipe = ReverseCameraPipeline()
    variables = pipe.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return HdrPredictor(variables, bucket_multiple=64)


def test_predictor_preserves_geometry(predictor, rng):
    for h, w in ((64, 64), (100, 140), (65, 64)):
        out = predictor(rng.rand(h, w, 3).astype(np.float32))
        assert out.shape == (h, w, 3)
        assert np.isfinite(out).all()


def test_predictor_bucketing_reuses_compilations(predictor, rng):
    """Images under the same bucket must share one compiled shape."""
    a = predictor(rng.rand(60, 60, 3).astype(np.float32))
    sizes_before = predictor._fwd._cache_size()
    b = predictor(rng.rand(50, 62, 3).astype(np.float32))  # same 64x64 bucket
    assert predictor._fwd._cache_size() == sizes_before
    assert a.shape == (60, 60, 3) and b.shape == (50, 62, 3)
