"""Tiled and spatially-sharded large-image inference tests (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import ReverseCameraPipeline
from singlehdr_tpu.tiled import TiledPredictor, _feather_weights, shard_spatial


@pytest.fixture(scope="module")
def variables():
    pipe = ReverseCameraPipeline()
    return pipe.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_feather_weights():
    w = _feather_weights(8, 2)
    np.testing.assert_allclose(w[2:6], 1.0)
    assert w[0] < w[1] < 1.0
    np.testing.assert_allclose(w, w[::-1])


def test_tiled_matches_whole_image_away_from_seams(variables, rng):
    """With the same global invCRF, tile interiors must match the whole-image
    result; seams may differ slightly within the feather."""
    img = rng.rand(128, 128, 3).astype(np.float32)
    pred = TiledPredictor(variables, tile=64, halo=16, invcrf_view=64)
    tiled = pred(img)
    assert tiled.shape == img.shape
    assert np.isfinite(tiled).all()

    # whole-image reference with the same (downsampled-view) invCRF pathway
    single = TiledPredictor(variables, tile=128, halo=16, invcrf_view=64)
    whole = single(img)
    # interiors of the four 64x64 tiles: compare away from tile boundaries
    center = (slice(8, 24), slice(8, 24))
    np.testing.assert_allclose(
        tiled[center], whole[center], atol=0.05
    )


def test_tiled_handles_non_tile_multiple_sizes(variables, rng):
    img = rng.rand(100, 150, 3).astype(np.float32)
    out = TiledPredictor(variables, tile=64, halo=16, invcrf_view=64)(img)
    assert out.shape == (100, 150, 3)
    assert np.isfinite(out).all()


def test_shard_spatial_matches_single_device(variables, rng):
    img = rng.rand(256, 64, 3).astype(np.float32)
    pipe = ReverseCameraPipeline()
    want = np.asarray(pipe.apply(variables, jnp.asarray(img)[None]).hdr[0])
    got = shard_spatial(variables, img, n_devices=4)
    np.testing.assert_allclose(got, want, atol=3e-5)
