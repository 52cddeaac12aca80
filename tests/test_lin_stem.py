"""Fused lin feature+stem kernel (ops/pallas/lin_stem_pallas.py).

Mosaic-only primitives don't run under the CPU interpreter, so the kernel
itself is validated on hardware; this CPU suite pins everything else:

  * a NUMPY simulation of the kernel's exact tap arithmetic (parity slabs,
    rolls+masks, ky slices, packed-weight matmuls) against the XLA oracle —
    any indexing error in _KY_TAPS/_KX_TAPS/prep/pack fails here without a
    TPU,
  * the model gate (fused only in eval+TPU at supported geometry), and
  * that the fused path's param owners initialize exactly like the dense
    stem conv + BatchNorm (one checkpoint layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.ops.pallas import lin_stem_pallas as m


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _simulate(x, kernel7, bias):
    """Numpy mirror of _kernel: same prep, taps, slices, and matmuls."""
    b, h, w, _ = x.shape
    ho, wo = h // 2, w // 2
    prep = np.asarray(m.prep_phases(jnp.asarray(x), jnp.float32))
    wm = np.asarray(m.pack_weights(jnp.asarray(kernel7), jnp.float32))
    rp_rows = prep.shape[-1] // wo

    def rowshift(buf, d):
        out = np.zeros_like(buf)
        if d > 0:
            out[:, :-d] = buf[:, d:]
        elif d < 0:
            out[:, -d:] = buf[:, :d]
        else:
            out = buf.copy()
        return out

    def tap(buf, mm):
        # buf [c, rows, wo]; col ox+mm with zero at borders
        out = np.zeros_like(buf)
        if mm > 0:
            out[..., :-mm] = buf[..., mm:]
        elif mm < 0:
            out[..., -mm:] = buf[..., :mm]
        else:
            out = buf.copy()
        return out

    outs = np.zeros((b, ho, wo, m.OUT_F), np.float32)
    for bi in range(b):
        slabs = [prep[bi, r].reshape(8, rp_rows, wo) for r in range(2)]
        feats = {}
        for r in range(2):
            cur, oth = slabs[r], slabs[1 - r]
            if r == 0:
                up, down = rowshift(oth, -1), oth
            else:
                up, down = oth, rowshift(oth, 1)

            def sw(v, cp):
                v0, v1 = v[0:3], v[3:6]
                if cp == 0:
                    return tap(v1, -1) + 2.0 * v0 + v1
                return v0 + 2.0 * v1 + tap(v0, 1)

            sh = [up[3 * g: 3 * g + 3] + 2.0 * cur[3 * g: 3 * g + 3]
                  + down[3 * g: 3 * g + 3] for g in range(2)]
            for cp in range(2):
                img = cur[3 * cp: 3 * cp + 3]
                dy = sw(down, cp) - sw(up, cp)
                dx = (sh[1] - tap(sh[1], -1)) if cp == 0 else (
                    tap(sh[0], 1) - sh[0]
                )
                parts = [img, np.stack([dy, dx], 1).reshape(6, rp_rows, wo)]
                for n_bins in m.HISTOGRAM_BINS:
                    for i in range(1, n_bins + 1):
                        c = (2.0 * i - 1.0) / (2.0 * n_bins)
                        parts.append(
                            np.maximum(0.0, 1.0 - np.abs(img - c) * n_bins)
                        )
                parts.append(np.zeros((m.FC - m.N_FEATURES, rp_rows, wo)))
                feats[(r, cp)] = np.concatenate(parts, 0)

        acc = np.zeros((m.OUT_F, ho, wo), np.float32)
        for ky, (r, d) in enumerate(m._KY_TAPS):
            pieces = []
            for _, (cp, mm) in m._KX_TAPS:
                f = feats[(r, cp)][:, d: d + ho]
                pieces.append(tap(f, mm))
            col = np.concatenate(pieces, 0).reshape(7 * m.FC, ho * wo)
            acc += (
                wm[:, ky * 7 * m.FC: (ky + 1) * 7 * m.FC] @ col
            ).reshape(m.OUT_F, ho, wo)
        out = np.maximum(acc + bias[:, None, None], 0.0)
        outs[bi] = np.transpose(out, (1, 2, 0))
    return outs


def test_simulated_kernel_matches_oracle_interior(rng):
    """The kernel's index math == the oracle away from the RING border
    (the wrapper recomputes the ring with the oracle itself).

    CPU-only by design: the 2e-4 exactness bound assumes f32-exact convs,
    and on TPU the oracle conv itself decomposes into bf16 passes (max
    ~1.3e-2 drift observed).  The device kernel is covered on hardware by
    test_kernel_matches_oracle_on_device below."""
    if jax.default_backend() != "cpu":
        pytest.skip("index-math exactness test; runs on CPU")
    x = rng.rand(2, 64, 256, 3).astype(np.float32)
    k = (rng.randn(7, 7, 93, 64) * 0.05).astype(np.float32)
    b = (rng.randn(64) * 0.01).astype(np.float32)
    sim = _simulate(x, k, b)
    ref = np.asarray(m._xla_reference(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    r = m.RING
    np.testing.assert_allclose(
        sim[:, r:-r, r:-r], ref[:, r:-r, r:-r], atol=2e-4, rtol=2e-4
    )


def test_simulated_kernel_whole_block_structure(rng):
    """Full-field check that ONLY the ring differs (bounds the wrapper's
    paste): everything inside the ring already matched above; the ring
    region must still be finite and shaped right."""
    x = rng.rand(1, 32, 256, 3).astype(np.float32)
    k = (rng.randn(7, 7, 93, 64) * 0.05).astype(np.float32)
    b = np.zeros(64, np.float32)
    sim = _simulate(x, k, b)
    assert sim.shape == (1, 16, 128, 64)
    assert np.isfinite(sim).all()


def test_gate_and_geometry():
    assert m.supported((4, 512, 512, 3))
    assert m.supported((4, 64, 256, 3))
    assert not m.supported((4, 64, 250, 3))   # W % 256
    assert not m.supported((4, 50, 256, 3))   # H % 32
    assert not m.supported((4, 64, 256, 4))   # channels


def test_model_gate_cpu(monkeypatch):
    """On CPU the model must take the dense path regardless of env."""
    from singlehdr_tpu.models.linearization import LinearizationNet

    monkeypatch.setenv("SINGLEHDR_FUSED_LIN", "1")
    net = LinearizationNet()
    x = jnp.zeros((1, 64, 256, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(v, x)
    assert out.shape == (1, 1024)


def test_param_owners_match_dense_init():
    """Fused-path param owners == dense stem conv/BN init (one layout)."""
    import flax.linen as nn

    from singlehdr_tpu.models.layers import batch_norm, conv
    from singlehdr_tpu.models.linearization import (
        _StemBnParams,
        _StemConvParams,
    )

    class Dense(nn.Module):
        @nn.compact
        def __call__(self, f):
            h = conv(64, 7, strides=2, name="stem")(f)
            return batch_norm(False, name="stem_bn")(h)

    class Owner(nn.Module):
        @nn.compact
        def __call__(self, f):
            _StemConvParams(name="stem")()
            _StemBnParams(name="stem_bn")()
            return f

    key = jax.random.PRNGKey(5)
    f = jnp.zeros((1, 16, 16, 93))
    vd = Dense().init(key, f)
    vo = Owner().init(key, f)
    kd, ko = vd["params"]["stem"], vo["params"]["stem"]
    np.testing.assert_array_equal(np.asarray(kd["kernel"]),
                                  np.asarray(ko["kernel"]))
    np.testing.assert_array_equal(np.asarray(kd["bias"]),
                                  np.asarray(ko["bias"]))
    for col in ("params", "batch_stats"):
        for name in vd[col]["stem_bn"]:
            np.testing.assert_array_equal(
                np.asarray(vd[col]["stem_bn"][name]),
                np.asarray(vo[col]["stem_bn"][name]),
            )


ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_oracle_on_device(rng, dtype):
    """The actual Mosaic kernel (incl. the ring paste) against the XLA
    oracle on hardware — the numpy simulation above pins the index math,
    this pins the Mosaic lowering (rolls, bitcasts, MXU transpose)."""
    x = jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32), dtype)
    k = jnp.asarray((rng.randn(7, 7, 93, 64) * 0.05).astype(np.float32), dtype)
    b = jnp.asarray((rng.randn(64) * 0.01).astype(np.float32))
    fused = np.asarray(m.lin_feature_stem(x, k, b), np.float32)
    ref = np.asarray(
        m._xla_reference(x.astype(dtype), k, b), np.float32
    )
    tol = 2e-4 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(fused, ref, atol=tol, rtol=tol)
