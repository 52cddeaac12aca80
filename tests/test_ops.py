import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu import ops
from singlehdr_tpu.ops.histogram import N_FEATURES


# ---------------------------------------------------------------- apply_rf


def _apply_rf_numpy(x, rf):
    """Straightforward per-element reference of tf_utils.apply_rf."""
    b, k = rf.shape
    out = np.empty_like(x)
    flat = x.reshape(b, -1)
    oflat = out.reshape(b, -1)
    for i in range(b):
        y = (k - 1) * flat[i]
        y0 = np.floor(y)
        i0 = np.clip(y0.astype(np.int64), 0, k - 1)
        i1 = np.clip(y0.astype(np.int64) + 1, 0, k - 1)
        w1 = y - y0
        oflat[i] = (1 - w1) * rf[i, i0] + w1 * rf[i, i1]
    return out


def test_apply_rf_matches_reference_semantics(rng):
    x = rng.rand(3, 8, 8, 3).astype(np.float32)
    rf = np.sort(rng.rand(3, 1024).astype(np.float32), axis=1)
    got = np.asarray(ops.apply_rf(jnp.asarray(x), jnp.asarray(rf)))
    want = _apply_rf_numpy(x, rf)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_apply_rf_identity_curve(rng):
    x = rng.rand(2, 4, 4, 3).astype(np.float32)
    rf = np.tile(np.linspace(0, 1, 1024, dtype=np.float32), (2, 1))
    got = np.asarray(ops.apply_rf(jnp.asarray(x), jnp.asarray(rf)))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_apply_rf_out_of_range_clamps():
    x = jnp.asarray([[-0.5, 0.0, 1.0, 1.5]], jnp.float32)
    rf = jnp.asarray(np.linspace(0.2, 0.8, 1024, dtype=np.float32))[None]
    got = np.asarray(ops.apply_rf(x, rf))
    np.testing.assert_allclose(got[0, 0], 0.2, atol=1e-6)
    np.testing.assert_allclose(got[0, 3], 0.8, atol=1e-6)


def test_apply_rf_exact_knots():
    # at exact grid points the lerp must return the knot value
    k = 5
    rf = jnp.asarray([[0.0, 0.1, 0.5, 0.7, 1.0]], jnp.float32)
    x = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]], jnp.float32)
    got = np.asarray(ops.apply_rf(x, rf))
    np.testing.assert_allclose(got[0], np.asarray(rf)[0], atol=1e-6)


def test_apply_rf_env_override_pins_impl(monkeypatch):
    """SINGLEHDR_APPLY_RF=xla must win over the backend probe: the hosted TPU
    plugin registers itself regardless of JAX_PLATFORMS, so default_backend()
    can report 'tpu' while the computation targets a CPU mesh (the driver's
    dryrun_multichip scenario) — where the Mosaic kernel cannot lower."""
    from singlehdr_tpu.ops import curves

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SINGLEHDR_APPLY_RF", "xla")
    x = jnp.asarray([[0.0, 0.25, 0.5, 1.0]], jnp.float32)
    rf = jnp.asarray(np.linspace(0.0, 1.0, 1024, dtype=np.float32))[None]
    got = np.asarray(curves.apply_rf(x, rf))  # would raise if pallas lowered
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)


def test_apply_rf_gradient_flows():
    rf = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32) ** 2)[None]
    f = lambda x: jnp.sum(ops.apply_rf(x, rf))
    g = jax.grad(f)(jnp.full((1, 4), 0.5, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g) > 0)


# ---------------------------------------------------------------- monotonic_rf


def test_monotonic_rf_projection(rng):
    rf = jnp.asarray(rng.randn(4, 1024).astype(np.float32))
    out = np.asarray(ops.monotonic_rf(rf))
    assert out.shape == (4, 1024)
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, -1], 1.0, atol=1e-5)
    assert np.all(np.diff(out, axis=-1) >= -1e-7)


def test_monotonic_rf_fixed_point():
    lin = jnp.asarray(np.linspace(0, 1, 1024, dtype=np.float32))[None]
    out = np.asarray(ops.monotonic_rf(lin))
    np.testing.assert_allclose(out[0], np.asarray(lin)[0], atol=1e-5)


# ---------------------------------------------------------------- decode_invcrf


def test_decode_invcrf():
    from singlehdr_tpu.calib import load_inverse_emor

    inv = load_inverse_emor()
    w = jnp.zeros((2, 11), jnp.float32).at[1, 2].set(1.0)
    out = np.asarray(ops.decode_invcrf(w, jnp.asarray(inv.mean), jnp.asarray(inv.basis)))
    np.testing.assert_allclose(out[0], inv.mean, atol=1e-6)
    np.testing.assert_allclose(out[1], inv.mean + inv.basis[:, 2], atol=1e-6)


# ---------------------------------------------------------------- histogram


def _soft_hist_loops(img, n_bins):
    """Reference semantics: per-bin python loop (linearization_net.py:336-350)."""
    outs = []
    for i in range(1, n_bins + 1):
        d = np.abs(img - (2.0 * i - 1.0) / (2.0 * n_bins))
        outs.append(np.where(d < 1.0 / n_bins, 1.0 - d * n_bins, 0.0))
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("n_bins", [4, 8, 16])
def test_soft_histogram_matches_loop_reference(rng, n_bins):
    img = rng.rand(2, 6, 5, 3).astype(np.float32)
    got = np.asarray(ops.soft_histogram(jnp.asarray(img), n_bins))
    want = _soft_hist_loops(img, n_bins)
    assert got.shape == (2, 6, 5, 3 * n_bins)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_soft_histogram_partition_of_unity(rng):
    # interior pixels: triangular kernels sum to 1 across bins
    img = jnp.asarray(rng.uniform(0.2, 0.8, (1, 4, 4, 3)).astype(np.float32))
    h = np.asarray(ops.soft_histogram(img, 8)).reshape(1, 4, 4, 8, 3)
    np.testing.assert_allclose(h.sum(axis=3), 1.0, atol=1e-5)


def test_linearization_features_channels(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    feats = ops.linearization_features(img)
    assert feats.shape == (1, 8, 8, N_FEATURES)
    assert N_FEATURES == 93


# ---------------------------------------------------------------- sobel


def _sobel_reference(img):
    """Direct 3x3 correlation with reflect padding."""
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
    kx = ky.T
    b, h, w, c = img.shape
    xp = np.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = np.zeros((b, h, w, c, 2), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + w]
            out[..., 0] += ky[dy, dx] * patch
            out[..., 1] += kx[dy, dx] * patch
    return out.reshape(b, h, w, 2 * c)


def test_sobel_matches_direct_convolution(rng):
    img = rng.rand(2, 9, 7, 3).astype(np.float32)
    got = np.asarray(ops.sobel_edges(jnp.asarray(img)))
    want = _sobel_reference(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sobel_constant_image_is_zero():
    img = jnp.full((1, 8, 8, 3), 0.3, jnp.float32)
    np.testing.assert_allclose(np.asarray(ops.sobel_edges(img)), 0.0, atol=1e-6)


def test_sobel_gradient_direction():
    # vertical ramp -> dy channel positive, dx ~ 0
    ramp = jnp.tile(jnp.linspace(0, 1, 8)[None, :, None, None], (1, 1, 8, 1))
    e = np.asarray(ops.sobel_edges(ramp))  # [1,8,8,2]
    assert np.all(e[0, 2:-2, 2:-2, 0] > 0)
    np.testing.assert_allclose(e[0, :, 2:-2, 1], 0.0, atol=1e-6)


# ---------------------------------------------------------------- tonemap


def test_mu_tonemap_endpoints():
    x = jnp.asarray([0.0, 1.0], jnp.float32)
    y = np.asarray(ops.mu_tonemap(x))
    np.testing.assert_allclose(y, [0.0, 1.0], atol=1e-6)


def test_hdr_log_roundtrip(rng):
    x = jnp.asarray(rng.rand(16).astype(np.float32) * 10)
    y = ops.hdr_log_decompression(ops.hdr_log_compression(x))
    # exp((x+1)*log(1+5000)) amplifies f32 rounding by ~log(5001); allow 1e-3
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------- masks


def test_highlight_alpha():
    x = jnp.zeros((1, 2, 2, 3), jnp.float32)
    x = x.at[0, 0, 0].set(jnp.asarray([1.0, 0.0, 0.0]))   # saturated in one channel
    x = x.at[0, 0, 1].set(jnp.asarray([0.94, 0.2, 0.2]))  # mid transition
    x = x.at[0, 1, 0].set(jnp.asarray([0.5, 0.5, 0.5]))   # well below threshold
    a = np.asarray(ops.highlight_alpha(x))
    assert a.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(a[0, 0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(a[0, 0, 1], (0.94 - 1.0 + 0.12) / 0.12, atol=1e-5)
    np.testing.assert_allclose(a[0, 1, 0], 0.0, atol=1e-6)


def test_exposure_loss_mask():
    # sample 0: all-white 256x256 -> masked out; sample 1: mid-gray -> kept
    img = np.stack(
        [
            np.full((256, 256, 3), 255.0, np.float32),
            np.full((256, 256, 3), 128.0, np.float32),
        ]
    )
    m = np.asarray(ops.exposure_loss_mask(jnp.asarray(img)))
    assert m.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(m[:, 0, 0, 0], [0.0, 1.0])


def test_exposure_loss_mask_rounding_boundary():
    # luma 248.6 rounds to 249 -> counts as over-exposed (TF rounds on cast)
    img = np.full((1, 256, 256, 3), 248.6, np.float32)
    m = np.asarray(ops.exposure_loss_mask(jnp.asarray(img)))
    np.testing.assert_allclose(m[0, 0, 0, 0], 0.0)


# ---------------------------------------------------------------- losses


def test_masked_l2():
    a = jnp.ones((2, 4, 4, 3), jnp.float32)
    b = jnp.zeros((2, 4, 4, 3), jnp.float32)
    mask = jnp.asarray([1.0, 0.0]).reshape(2, 1, 1, 1)
    loss = np.asarray(ops.masked_l2(a, b, mask))
    np.testing.assert_allclose(loss[:, 0, 0, 0], [1.0, 0.0], atol=1e-6)


def test_tv_loss_matches_padded_diff_form(rng):
    x = rng.rand(2, 5, 6, 3).astype(np.float32)
    # reference form: symmetric pad by one then mean |diff| over the padded count
    px = np.concatenate([x, x[:, -1:]], axis=1)
    py = np.concatenate([x, x[:, :, -1:]], axis=2)
    want = np.mean(np.abs(px[:, 1:] - px[:, :-1])) + np.mean(np.abs(py[:, :, 1:] - py[:, :, :-1]))
    got = float(ops.tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_perceptual_l1():
    fa = (jnp.ones((2, 4, 4, 8)), jnp.zeros((2, 2, 2, 16)))
    fb = (jnp.zeros((2, 4, 4, 8)), jnp.zeros((2, 2, 2, 16)))
    loss = np.asarray(ops.perceptual_l1(fa, fb))
    np.testing.assert_allclose(loss[:, 0, 0, 0], [1.0, 1.0], atol=1e-6)


# ---------------------------------------------------------------- resize / pool


def test_resize_bilinear_x2_matches_jax_image(rng):
    x = jnp.asarray(rng.rand(2, 7, 5, 3).astype(np.float32))
    got = np.asarray(ops.resize_bilinear_x2(x))
    want = np.asarray(
        jax.image.resize(x, (2, 14, 10, 3), method="bilinear")
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_2x2():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    got = np.asarray(ops.avg_pool_2x2(x))
    want = np.asarray([[[[2.5], [4.5]], [[10.5], [12.5]]]])
    np.testing.assert_allclose(got, want)


def test_max_pool_same_3x3_stride2():
    x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    got = np.asarray(ops.max_pool(x, 3, 2, "SAME"))
    assert got.shape == (1, 3, 3, 1)
    # top-left window covers rows 0..1, cols 0..1 under SAME -> max = 6
    np.testing.assert_allclose(got[0, 0, 0, 0], 6.0)
    np.testing.assert_allclose(got[0, 2, 2, 0], 24.0)


# ---------------------------------------------------------------- color


def test_flip_channels_involution(rng):
    x = jnp.asarray(rng.rand(1, 2, 2, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(ops.flip_channels(ops.flip_channels(x))), np.asarray(x)
    )


def test_vgg_preprocess():
    x = jnp.ones((1, 1, 1, 3), jnp.float32)  # white
    out = np.asarray(ops.vgg_preprocess(x))[0, 0, 0]
    np.testing.assert_allclose(
        out, [255 - 103.939, 255 - 116.779, 255 - 123.68], atol=1e-4
    )


def test_rgb_to_grayscale_u8():
    img = jnp.asarray([[[[255.0, 255.0, 255.0], [0.0, 0.0, 0.0]]]])
    g = np.asarray(ops.rgb_to_grayscale_u8(img))
    np.testing.assert_allclose(g[0, 0, :, 0], [255.0, 0.0])
