"""Fused upsample+conv: exact equivalence with resize_bilinear_x2 + conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from singlehdr_tpu.models.layers import UpsampleConv
from singlehdr_tpu.ops.resize import resize_bilinear_x2
from singlehdr_tpu.ops.upsample_conv import upsample_conv_x2


def _reference(x, k):
    return lax.conv_general_dilated(
        resize_bilinear_x2(x), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 5), 7),
    ((1, 5, 9, 3), 4),     # odd sizes: border strips at non-multiple dims
    ((3, 16, 4, 2), 2),    # narrow width
])
def test_fused_matches_resize_conv_everywhere(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1], cout) * 0.3, jnp.float32)
    got = upsample_conv_x2(x, k)
    want = _reference(x, k)
    assert got.shape == want.shape
    # exact math modulo f32 reassociation — borders included
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4) * 0.3, jnp.float32)
    cot = jnp.asarray(rng.randn(1, 12, 12, 4), jnp.float32)
    g_f = jax.grad(lambda k: jnp.vdot(upsample_conv_x2(x, k), cot))(k)
    g_r = jax.grad(lambda k: jnp.vdot(_reference(x, k), cot))(k)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=2e-4)


def test_layer_param_compat_and_forced_fusion():
    """UpsampleConv params interchange with the unfused path bit-for-bit."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 8, 8, 6), jnp.float32)
    fused = UpsampleConv(5, act="relu", force_fused=True)
    plain = UpsampleConv(5, act="relu", force_fused=False)
    v = fused.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (3, 3, 6, 5)
    y_f = fused.apply(v, x)
    y_p = plain.apply(v, x)  # off-TPU fallback: resize + conv
    assert y_f.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p), atol=2e-5)


def test_fused_path_under_spatial_mesh():
    """The fused (TPU) form compiles and matches under row sharding.

    Real multi-chip TPUs take force-fused UpsampleConv through XLA SPMD; the
    border strips slice across shard boundaries, so validate equivalence on
    the virtual CPU mesh explicitly (the CPU fallback would otherwise hide
    the fused path from the sharded test suite).
    """
    from singlehdr_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 6).astype(np.float32)
    mod = UpsampleConv(4, act="leaky_relu", force_fused=True)
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 6)))

    fwd = jax.jit(lambda v, a: mod.apply(v, a))
    ref = np.asarray(fwd(v, jnp.asarray(x)))

    mesh = make_mesh(8, spatial=4)
    xs = jax.device_put(x, batch_sharding(mesh, spatial_dim=1))
    out = np.asarray(fwd(replicate(mesh, v), xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)
