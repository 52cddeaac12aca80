"""Pallas kernel semantics tests (interpreter mode — runs on the CPU suite).

The real-TPU performance validation (bit-exactness + ~11x speedup vs the XLA
gather at 8x512x512) runs on hardware; these tests pin the kernel's math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.pallas.apply_rf_pallas import apply_rf_pallas


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 8, 3),       # tiny, padded n
        (3, 100, 67, 3),    # odd everything
        (8, 32, 32, 3),     # exact group
        (9, 16, 16, 3),     # batch pad
    ],
)
def test_pallas_matches_xla_forward(rng, shape):
    x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 1.3 - 0.15)
    rf = jnp.asarray(np.sort(rng.rand(shape[0], 1024).astype(np.float32), axis=1))
    got = apply_rf_pallas(x, rf, interpret=True)
    want = apply_rf(x, rf, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_identity_curve(rng):
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    rf = jnp.tile(jnp.linspace(0, 1, 1024), (2, 1)).astype(jnp.float32)
    out = apply_rf_pallas(x, rf, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


def test_pallas_rejects_bad_shapes(rng):
    x = jnp.zeros((3, 4, 4, 3))
    rf = jnp.zeros((2, 1024))
    with pytest.raises(ValueError):
        apply_rf_pallas(x, rf, interpret=True)
    with pytest.raises(ValueError):
        apply_rf_pallas(jnp.zeros((2, 4)), jnp.zeros((2, 1000)), interpret=True)


def test_auto_impl_dispatches_to_xla_on_cpu(rng):
    # on the CPU suite, impl="auto" must not require Mosaic
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    rf = jnp.tile(jnp.linspace(0, 1, 1024), (2, 1)).astype(jnp.float32)
    out = apply_rf(x, rf, impl="auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


def test_custom_vjp_matches_autodiff_in_interpret_mode(rng):
    """Gradient wrt x and rf must match XLA autodiff of the gather form.

    Uses jax.custom_vjp machinery with the interpreter by monkey-free direct
    call: the bwd kernel itself is exercised on TPU; here we check the math of
    the bwd formulas through a pure-numpy replica.
    """
    b, n, k = 2, 64, 1024
    x = rng.rand(b, n).astype(np.float32)
    rf = np.sort(rng.rand(b, k).astype(np.float32), axis=1)
    g = rng.rand(b, n).astype(np.float32)

    # reference gradients via jax autodiff of the XLA implementation
    f = lambda xx, rr: jnp.vdot(jnp.asarray(g), apply_rf(xx, rr, impl="xla"))
    gx_ref, grf_ref = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(rf))

    # bwd formulas as implemented in the kernel
    y = (k - 1) * x
    y0 = np.floor(y)
    frac = y - y0
    i0 = np.clip(y0.astype(np.int64), 0, k - 1)
    i1 = np.clip(y0.astype(np.int64) + 1, 0, k - 1)
    v0 = np.take_along_axis(rf, i0, axis=1)
    v1 = np.take_along_axis(rf, i1, axis=1)
    gx = (k - 1.0) * (v1 - v0) * g
    grf = np.zeros_like(rf)
    for s in range(b):
        np.add.at(grf[s], i0[s], (1 - frac[s]) * g[s])
        np.add.at(grf[s], i1[s], frac[s] * g[s])

    np.testing.assert_allclose(gx, np.asarray(gx_ref), atol=1e-4)
    np.testing.assert_allclose(grf, np.asarray(grf_ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Fused encoder-stage kernel (ops/pallas/enc_pool_pallas.py).  Mosaic-only
# primitives (pltpu.roll/bitcast) don't run under the CPU interpreter, so the
# kernel itself is validated on hardware; here we pin (a) the XLA fallback
# oracle against the dense flax path it must equal, and (b) the static gate.


def test_enc_pool_xla_reference_matches_dense_stage(rng):
    from singlehdr_tpu.models.hallucination import EncoderStage
    from singlehdr_tpu.ops.pallas.enc_pool_pallas import _xla_reference

    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    stage = EncoderStage(features=8, n_convs=2)
    v = stage.init(jax.random.PRNGKey(0), x)
    pooled, skip, nchw = stage.apply(v, x)
    assert not nchw  # CPU suite always takes the dense path
    p = v["params"]
    pooled2, skip2 = _xla_reference(
        x, p["conv1"]["kernel"], p["conv1"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(skip2), atol=1e-5)


def test_enc_pool_shape_gate(monkeypatch):
    from singlehdr_tpu.models.hallucination import _fused_enc_allowed
    from singlehdr_tpu.ops.pallas import enc_pool_pallas as m

    assert m.supported((64, 512, 512, 3), 64)
    assert m.supported((64, 64, 256, 256), 128, nchw=True)   # chained stage
    assert not m.supported((64, 512, 500, 3), 64)   # W % 128
    assert not m.supported((64, 24, 512, 3), 64)    # H % 16
    monkeypatch.setenv("SINGLEHDR_FUSED_ENC", "0")
    assert not _fused_enc_allowed(1)
    monkeypatch.setenv("SINGLEHDR_FUSED_ENC", "1")
    assert _fused_enc_allowed(10**18)  # explicit on overrides the budget
    monkeypatch.delenv("SINGLEHDR_FUSED_ENC", raising=False)
    # measured fit budget (BENCH_NOTES r4 "NHWC skip boundary"): with the
    # boundary transpose the fused chain's arena is dense-identical, so the
    # gate now encodes whole-pipeline HBM fit — enc1 fused through b120 @
    # 512^2 (compiles, 12.97 GiB temp, +3.1%), dense at b128 (compile OOM
    # fused; dense is also the faster batch outright)
    assert _fused_enc_allowed(64 * 512 * 512 * 64)
    assert _fused_enc_allowed(96 * 512 * 512 * 64)
    assert _fused_enc_allowed(120 * 512 * 512 * 64)
    assert not _fused_enc_allowed(128 * 512 * 512 * 64)
    assert _fused_enc_allowed(128 * 256 * 256 * 128)


def test_enc_stage_fusion_chains_from_stem(rng, monkeypatch):
    """A mid-chain stage with an NHWC (non-stem) input must take the dense
    path even when everything else allows fusion: enc2-only fusion at b128
    measured a 2% end-to-end LOSS (the NHWC->NCHW entry transpose isn't
    covered without the fused stem feeding it channels-major)."""
    from singlehdr_tpu.models.hallucination import EncoderStage

    monkeypatch.setenv("SINGLEHDR_FUSED_ENC", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = jnp.asarray(rng.rand(2, 16, 128, 8).astype(np.float32))  # cin=8 NHWC
    stage = EncoderStage(features=8, n_convs=2)
    v = stage.init(jax.random.PRNGKey(0), x)
    _, _, nchw = stage.apply(v, x)
    assert not nchw  # dense path: fusion may only chain from the 3-ch stem
