import numpy as np

from singlehdr_tpu.calib import (
    get_crf_bank,
    get_exposure_ladder,
    inverse_response,
    load_emor,
    load_inverse_emor,
)


def test_emor_shapes():
    fwd = load_emor()
    inv = load_inverse_emor()
    assert fwd.mean.shape == (1024,)
    assert fwd.basis.shape == (1024, 25)
    assert inv.mean.shape == (1024,)
    assert inv.basis.shape == (1024, 25)
    # sample grids are uniform on [0, 1]
    np.testing.assert_allclose(fwd.x, np.linspace(0, 1, 1024), atol=1e-5)
    np.testing.assert_allclose(inv.x, np.linspace(0, 1, 1024), atol=1e-5)


def test_emor_mean_curves_are_valid_crfs():
    for m in (load_emor(), load_inverse_emor()):
        assert abs(m.mean[0]) < 1e-3
        assert abs(m.mean[-1] - 1.0) < 1e-3
        assert np.all(np.diff(m.mean) >= -1e-5)


def test_emor_curve_reconstruction():
    fwd = load_emor()
    w = np.zeros((2, 11), np.float32)
    w[1, 0] = 0.5
    curves = fwd.curve(w)
    np.testing.assert_allclose(curves[0], fwd.mean, atol=1e-6)
    np.testing.assert_allclose(curves[1], fwd.mean + 0.5 * fwd.basis[:, 0], atol=1e-6)


def test_inverse_response_identity():
    lin = np.linspace(0, 1, 1024, dtype=np.float32)
    np.testing.assert_allclose(inverse_response(lin), lin, atol=1e-6)


def test_inverse_response_gamma():
    x = np.linspace(0, 1, 1024, dtype=np.float32)
    crf = x**0.5
    inv = inverse_response(crf)
    # inverse of sqrt is square
    np.testing.assert_allclose(inv, x**2, atol=2e-3)


def test_crf_bank_split_and_monotonicity():
    bank = get_crf_bank()
    assert bank.train_crf.shape == (191, 1024)
    assert bank.test_crf.shape == (10, 1024)
    assert bank.train_invcrf.shape == (191, 1024)
    for curves in (bank.train_crf, bank.test_crf, bank.train_invcrf):
        assert np.all(np.diff(curves, axis=-1) >= -1e-6)
        np.testing.assert_allclose(curves[:, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(curves[:, -1], 1.0, atol=1e-5)
    # round trip: crf(invcrf(x)) ~ x away from the flat tails
    x = np.linspace(0.05, 0.95, 64, dtype=np.float32)
    for i in range(0, 191, 37):
        crf = bank.train_crf[i]
        inv = bank.train_invcrf[i]
        y = np.interp(np.interp(x, np.linspace(0, 1, 1024), inv), np.linspace(0, 1, 1024), crf)
        np.testing.assert_allclose(y, x, atol=5e-2)


def test_crf_bank_deterministic():
    a = get_crf_bank()
    b = get_crf_bank()
    np.testing.assert_array_equal(a.train_crf, b.train_crf)


def test_exposure_ladder():
    t = get_exposure_ladder(7)
    assert t.shape == (7,)
    np.testing.assert_allclose(t[0], 0.125, atol=1e-6)
    np.testing.assert_allclose(t[-1], 8.0, atol=1e-6)
    np.testing.assert_allclose(t[3], 1.0, atol=1e-6)
    assert get_exposure_ladder(600).shape == (600,)
