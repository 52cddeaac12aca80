"""Fused decoder-tail kernel (ops/pallas/dec_tail_pallas.py) semantics tests.

The kernel's Mosaic build only runs on TPU; these tests run it under the
Pallas TPU interpreter (DMA/semaphore emulation) on the CPU suite, against a
hand-written oracle of the dense chain (hallucination_net.py:77-107,179-190
semantics, f32).  A full-model parity test engages the fused path through
``SINGLEHDR_FORCE_FUSED_DEC`` and compares it against the dense module path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from singlehdr_tpu.ops.pallas import dec_tail_pallas as m
from singlehdr_tpu.ops.upsample_conv import upsample_conv_x2


def _rand_params(rng, C, F):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2
    return m.DecTailParams(
        kd=r(3, 3, C, F),
        bd=r(F),
        bn1_scale=1.0 + 0.1 * r(F),
        bn1_bias=r(F),
        bn1_mean=r(F),
        bn1_var=1.0 + jnp.abs(r(F)),
        ksk=r(1, 1, 2 * F, F),
        bsk=r(F),
        kh=r(1, 1, F, 3),
        bh=r(3),
        bn2_scale=1.0 + 0.1 * r(3),
        bn2_bias=r(3),
        bn2_mean=r(3),
        bn2_var=1.0 + jnp.abs(r(3)),
        k0=r(1, 1, 6, 3),
        b0=r(3),
    )


def _oracle(x_nhwc, skip_nhwc, bgr, p):
    """Dense-chain reference, written independently of the kernel helpers."""
    eps = 1e-3
    ein = lambda a, k: jnp.einsum("bhwc,co->bhwo", a, k)
    y = jax.nn.relu(upsample_conv_x2(x_nhwc, p.kd) + p.bd)
    s1 = p.bn1_scale / jnp.sqrt(p.bn1_var + eps)
    y = jax.nn.relu((y - p.bn1_mean) * s1 + p.bn1_bias)
    F = p.kd.shape[3]
    z = ein(y, p.ksk[0, 0, :F]) + ein(skip_nhwc / 255.0, p.ksk[0, 0, F:]) + p.bsk
    h = ein(z, p.kh[0, 0]) + p.bh
    s2 = p.bn2_scale / jnp.sqrt(p.bn2_var + eps)
    h = jax.nn.relu((h - p.bn2_mean) * s2 + p.bn2_bias)
    o = ein(h, p.k0[0, 0, :3]) + ein(bgr / 255.0, p.k0[0, 0, 3:]) + p.b0
    return jax.nn.relu(o)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_fused_matches_dense_chain_interpret(rng):
    B, C, F, H, W = 1, 16, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    skip = jnp.asarray(
        rng.standard_normal((B, F, 2 * H, 2 * W)), jnp.float32
    ) * 40.0
    bgr = jnp.asarray(
        rng.standard_normal((B, 2 * H, 2 * W, 3)), jnp.float32
    ) * 40.0
    p = _rand_params(rng, C, F)

    got = m.dec_tail_fused(x, skip, bgr, p, interpret=True)
    want = _oracle(jnp.transpose(x, (0, 2, 3, 1)),
                   jnp.transpose(skip, (0, 2, 3, 1)), bgr, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_border_ring_is_exact_not_composite(rng):
    """The outer high-res ring uses SAME zero padding (not the resize
    clamp) — a constant input makes the discrepancy obvious."""
    B, C, F, H, W = 1, 8, 8, 8, 128
    x = jnp.ones((B, C, H, W), jnp.float32)
    skip = jnp.zeros((B, F, 2 * H, 2 * W), jnp.float32)
    bgr = jnp.zeros((B, 2 * H, 2 * W, 3), jnp.float32)
    p = _rand_params(rng, C, F)
    got = m.dec_tail_fused(x, skip, bgr, p, interpret=True)
    want = _oracle(jnp.transpose(x, (0, 2, 3, 1)),
                   jnp.transpose(skip, (0, 2, 3, 1)), bgr, p)
    # interior and ring both match; ring differs from interior values
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _rand_stage_params(rng, C, F):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2
    return m.DecStageParams(
        kd=r(3, 3, C, F),
        bd=r(F),
        bn_scale=1.0 + 0.1 * r(F),
        bn_bias=r(F),
        bn_mean=r(F),
        bn_var=1.0 + jnp.abs(r(F)),
        ksk=r(1, 1, 2 * F, F),
        bsk=r(F),
    )


@pytest.mark.parametrize("W", [128, 64])
def test_stage_fused_matches_dense_chain_interpret(rng, W):
    """W=64 exercises the rolled-piece path (kh-row offsets that are not
    lane-tile-aligned are reached by rotating the slab)."""
    B, C, F, H = 1, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    skip = jnp.asarray(
        rng.standard_normal((B, F, 2 * H, 2 * W)), jnp.float32
    ) * 40.0
    p = _rand_stage_params(rng, C, F)

    got = m.dec_stage_fused(x, skip, p, interpret=True)  # NCHW out
    eps = 1e-3
    y = jax.nn.relu(
        upsample_conv_x2(jnp.transpose(x, (0, 2, 3, 1)), p.kd) + p.bd
    )
    s1 = p.bn_scale / jnp.sqrt(p.bn_var + eps)
    y = jax.nn.relu((y - p.bn_mean) * s1 + p.bn_bias)
    skip_nhwc = jnp.transpose(skip, (0, 2, 3, 1))
    want = (
        jnp.einsum("bhwc,co->bhwo", y, p.ksk[0, 0, :F])
        + jnp.einsum("bhwc,co->bhwo", skip_nhwc / 255.0, p.ksk[0, 0, F:])
        + p.bsk
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 2, 3, 1))), np.asarray(want),
        rtol=2e-4, atol=2e-4,
    )


def test_supported_gate():
    assert m.supported((2, 128, 256, 256), 64)
    assert m.supported((1, 16, 8, 128), 8)
    assert m.supported((2, 512, 64, 64), 256)        # dec3 @512^2 (W=64)
    assert not m.supported((2, 128, 256, 250), 64)   # W % 64
    assert not m.supported((2, 130, 256, 256), 64)   # C % 8
    assert not m.supported((2, 128, 9, 256), 64)     # H % 8
    assert not m.supported((2, 128, 256), 64)        # rank


def _tiny_model_io(rng):
    from singlehdr_tpu.models.hallucination import HallucinationNet

    model = HallucinationNet()
    # H=32 is the smallest height the 5-pool encoder reconstructs exactly
    x = jnp.asarray(rng.random((1, 32, 256, 3)), jnp.float32)
    return model, x


def test_model_fused_tail_parity(rng, monkeypatch):
    """Full HallucinationNet: fused tail (forced, interpreter) == dense."""
    model, x = _tiny_model_io(rng)
    monkeypatch.delenv("SINGLEHDR_FORCE_FUSED_DEC", raising=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("SINGLEHDR_FORCE_FUSED_DEC", "1")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_model_fused_dec2_chain_parity(rng, monkeypatch):
    """At a geometry where dec2 AND dec1 both fuse (W=512), the chained
    fused stages still match the dense module path."""
    from singlehdr_tpu.models.hallucination import HallucinationNet

    model = HallucinationNet()
    x = jnp.asarray(rng.random((1, 32, 512, 3)), jnp.float32)
    monkeypatch.delenv("SINGLEHDR_FORCE_FUSED_DEC", raising=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("SINGLEHDR_FORCE_FUSED_DEC", "1")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # the dec2 parameter-owner path reproduces the dense tree too
    fused = model.init(jax.random.PRNGKey(0), x, train=False)
    d = jax.tree_util.tree_leaves_with_path(variables)
    f = jax.tree_util.tree_leaves_with_path(fused)
    assert [(p, v.shape) for p, v in d] == [(p, v.shape) for p, v in f]


def test_model_fused_dec3_boundary_parity(rng, monkeypatch):
    """At H=64 the fused suffix is dec3..dec1 (dec3 runs the W=64 rolled
    path) with the dense skip4 fusion emitting NCHW into it."""
    from singlehdr_tpu.models.hallucination import HallucinationNet

    model = HallucinationNet()
    x = jnp.asarray(rng.random((1, 64, 512, 3)), jnp.float32)
    monkeypatch.delenv("SINGLEHDR_FORCE_FUSED_DEC", raising=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("SINGLEHDR_FORCE_FUSED_DEC", "1")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_model_init_tree_identical_under_fused_tail(rng, monkeypatch):
    """The fused path's parameter-owner modules reproduce the dense tree
    exactly (names, shapes, dtypes) — one checkpoint layout for both."""
    model, x = _tiny_model_io(rng)
    monkeypatch.delenv("SINGLEHDR_FORCE_FUSED_DEC", raising=False)
    dense = model.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.setenv("SINGLEHDR_FORCE_FUSED_DEC", "1")
    fused = model.init(jax.random.PRNGKey(0), x, train=False)

    d = jax.tree_util.tree_leaves_with_path(dense)
    f = jax.tree_util.tree_leaves_with_path(fused)
    assert [(p, v.shape, v.dtype) for p, v in d] == [
        (p, v.shape, v.dtype) for p, v in f
    ]
    for (_, dv), (_, fv) in zip(d, f):
        np.testing.assert_array_equal(np.asarray(dv), np.asarray(fv))
