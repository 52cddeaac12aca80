"""Strip-conv kernel semantics (interpreter mode; perf numbers live in
BENCH_NOTES.md — standalone wins at f32, flag-gated off in the pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import ReverseCameraPipeline
from singlehdr_tpu.ops.pallas.strip_conv_pallas import (
    build_strip_weights,
    strip_conv,
    strip_conv_supported,
)


def _ref_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


@pytest.mark.parametrize(
    "cin,cout,k,h,wdt",
    [
        (3, 16, 7, 32, 40),    # deq/ref stem1 shape family (stem2 = same kernel, Cin 16)
        (32, 16, 3, 16, 24),   # up1 convs
        (16, 3, 3, 32, 40),    # head (Cout padded 3 -> 4)
        (16, 32, 3, 16, 24),   # Cout 32
    ],
)
def test_strip_conv_matches_lax_conv(rng, cin, cout, k, h, wdt):
    x = jnp.asarray(rng.rand(2, h, wdt, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    got = strip_conv(x, w, b, interpret=True)
    want = _ref_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_strip_conv_fused_activation(rng):
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    b = jnp.zeros(16)
    got = strip_conv(x, w, b, act="leaky_relu", interpret=True)
    want = jax.nn.leaky_relu(_ref_conv(x, w, b), 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_build_strip_weights_toeplitz_structure(rng):
    w = jnp.asarray(rng.randn(3, 3, 2, 16).astype(np.float32))
    ws = np.asarray(build_strip_weights(w, rows=8))  # [128, 2*10*3]
    assert ws.shape == (128, 60)
    # row block i only touches ry in [i, i+kh): everything else is zero
    ws5 = ws.reshape(8, 16, 2, 10, 3)
    for i in range(8):
        mask = np.ones(10, bool)
        mask[i : i + 3] = False
        assert np.all(ws5[i, :, :, mask, :] == 0)
        np.testing.assert_array_equal(
            ws5[i, :, :, i : i + 3, :],
            np.transpose(np.asarray(w), (3, 2, 0, 1))[None, :, :, :, :][0],
        )


def test_supported_predicate():
    assert strip_conv_supported((1, 64, 64, 3), 16)      # rows=8 divides 64
    assert not strip_conv_supported((1, 60, 64, 3), 16)  # 60 % 8 != 0
    assert not strip_conv_supported((1, 64, 64, 3), 200)


def test_fast_convs_pipeline_matches_dense_on_cpu(rng):
    """fast_convs=True must fall back to identical dense math on CPU."""
    ldr = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = ReverseCameraPipeline().init(jax.random.PRNGKey(0), ldr)
    dense = ReverseCameraPipeline().apply(variables, ldr).hdr
    fast = ReverseCameraPipeline(fast_convs=True).apply(variables, ldr).hdr
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=2e-5)
