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


def test_predict_batch_cold_group_runs_exact_size(predictor, rng):
    """A cold group compiles at its exact size (no blanket power-of-two
    repeat-padding); later smaller groups reuse the warm executable."""
    imgs3 = [rng.rand(64, 64, 3).astype(np.float32) for _ in range(3)]
    outs = predictor.predict_batch(imgs3)
    assert len(outs) == 3
    warm = predictor._warm[predictor.bucket_key((64, 64, 3))]
    assert 3 in warm and 4 not in warm  # exact size, not padded to pow2
    # a 2-group now repeat-pads up to the warm size 3 instead of compiling n=2
    cache_before = predictor._fwd._cache_size()
    outs2 = predictor.predict_batch(imgs3[:2])
    assert len(outs2) == 2
    assert predictor._fwd._cache_size() == cache_before
    assert 2 not in warm  # reused the warm n=3 executable


def test_predict_batch_mixed_buckets_rejected(predictor, rng):
    with pytest.raises(ValueError):
        predictor.predict_batch(
            [
                rng.rand(64, 64, 3).astype(np.float32),
                rng.rand(128, 64, 3).astype(np.float32),
            ]
        )
