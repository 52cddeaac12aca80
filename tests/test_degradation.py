import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.ops.degradation import (
    CaptureSim,
    loss_mask_from_levels,
    simulate_capture,
)


def _inputs(rng, b=4, hw=64):
    hdr = rng.rand(b, hw, hw, 3).astype(np.float32)
    hdr = 0.5 * hdr / hdr.mean(axis=(1, 2, 3), keepdims=True)
    crf = np.tile(np.linspace(0, 1, 1024, dtype=np.float32) ** 0.7, (b, 1))
    t = np.asarray([0.25, 1.0, 2.0, 8.0], np.float32)[:b]
    return jnp.asarray(hdr), jnp.asarray(crf), jnp.asarray(t)


def test_simulate_capture_shapes_and_ranges(rng):
    hdr, crf, t = _inputs(rng)
    sim = simulate_capture(jax.random.PRNGKey(0), hdr, crf, t)
    assert isinstance(sim, CaptureSim)
    assert sim.hdr_t.shape == hdr.shape
    assert sim.ldr.shape == hdr.shape
    assert sim.quantized_u8.dtype == jnp.uint8
    assert float(sim.hdr_t.min()) >= 0.0  # relu after noise
    assert 0.0 <= float(sim.clipped_hdr_t.min())
    assert float(sim.clipped_hdr_t.max()) <= 1.0
    assert 0.0 <= float(sim.ldr.min()) and float(sim.ldr.max()) <= 1.0


def test_simulate_capture_exposure_scales_signal(rng):
    hdr, crf, t = _inputs(rng)
    sim = simulate_capture(jax.random.PRNGKey(0), hdr, crf, t)
    means = np.asarray(jnp.mean(sim.hdr_t, axis=(1, 2, 3)))
    # per-sample means should track the exposure ladder (noise is small)
    base = np.asarray(jnp.mean(hdr, axis=(1, 2, 3)))
    np.testing.assert_allclose(means, base * np.asarray(t), rtol=0.05)


def test_simulate_capture_deterministic_under_key(rng):
    hdr, crf, t = _inputs(rng)
    a = simulate_capture(jax.random.PRNGKey(7), hdr, crf, t)
    b = simulate_capture(jax.random.PRNGKey(7), hdr, crf, t)
    np.testing.assert_array_equal(np.asarray(a.ldr), np.asarray(b.ldr))
    c = simulate_capture(jax.random.PRNGKey(8), hdr, crf, t)
    assert not np.allclose(np.asarray(a.ldr), np.asarray(c.ldr))


def test_simulate_capture_jits(rng):
    hdr, crf, t = _inputs(rng)
    f = jax.jit(simulate_capture)
    sim = f(jax.random.PRNGKey(0), hdr, crf, t)
    assert bool(jnp.all(jnp.isfinite(sim.ldr)))


def test_noise_statistics(rng):
    # with identity CRF and t=1, ldr ~ clip(hdr + noise); noise std bounded by
    # sigma_s*signal + sigma_c upper bounds
    b, hw = 2, 128
    hdr = jnp.full((b, hw, hw, 3), 0.5, jnp.float32)
    crf = jnp.tile(jnp.linspace(0, 1, 1024), (b, 1)).astype(jnp.float32)
    t = jnp.ones((b,), jnp.float32)
    sim = simulate_capture(jax.random.PRNGKey(0), hdr, crf, t)
    resid = np.asarray(sim.ldr) - 0.5
    assert np.abs(resid.mean()) < 1e-3
    assert resid.std() < (0.08 / 6 * 0.5 + 0.005) * 1.2
    assert resid.std() > 1e-4  # noise is actually applied


def test_loss_mask_from_levels():
    levels = np.zeros((2, 256, 256, 3), np.uint8)
    levels[0] = 255  # saturated sample -> masked
    levels[1] = 100
    m = np.asarray(loss_mask_from_levels(jnp.asarray(levels)))
    np.testing.assert_allclose(m[:, 0, 0, 0], [0.0, 1.0])
