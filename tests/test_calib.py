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


def _write_dorf_fixture(path, n_curves=12, samples=1024, seed=7):
    """Emit a dorfCurves.txt in the real 6-line record layout:
    name / type / 'I =' / irradiance values / 'B =' / brightness values
    (the reference reads line idx+5 of each record, dataset.py:28)."""
    rng = np.random.RandomState(seed)
    grid = np.linspace(0.0, 1.0, samples)
    lines = []
    for i in range(n_curves):
        gamma = rng.uniform(0.4, 2.5)
        b = grid ** gamma
        lines += [
            f"fixture-curve-{i:03d}",
            "synthetic gamma response",
            "I =",
            " ".join(f"{v:.6e}" for v in grid),
            "B =",
            " ".join(f"{v:.6e}" for v in b),
        ]
    path.write_text("\n".join(lines) + "\n")
    return n_curves, samples


def test_parse_dorf_text_fixture(tmp_path):
    from singlehdr_tpu.calib.crf import _parse_dorf_text

    fp = tmp_path / "dorfCurves.txt"
    n, s = _write_dorf_fixture(fp)
    curves = _parse_dorf_text(str(fp))
    assert curves.shape == (n, s)
    assert curves.dtype == np.float32
    # parsed rows are the brightness (monotone) lines, not irradiance headers
    assert np.all(np.diff(curves, axis=-1) >= -1e-6)
    np.testing.assert_allclose(curves[:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(curves[:, -1], 1.0, atol=1e-5)


def test_crf_bank_from_dorf_file(tmp_path):
    """get_crf_bank(dorf_path) must split with RandomState(730) and hold out
    the last 10 shuffled curves, exactly like dataset.py:30-33."""
    fp = tmp_path / "dorfCurves.txt"
    n, _ = _write_dorf_fixture(fp)
    bank = get_crf_bank(str(fp))
    assert bank.test_crf.shape == (10, 1024)
    assert bank.train_crf.shape == (n - 10, 1024)

    from singlehdr_tpu.calib.crf import _parse_dorf_text

    expected = _parse_dorf_text(str(fp)).copy()
    np.random.RandomState(730).shuffle(expected)
    np.testing.assert_array_equal(bank.test_crf, expected[-10:])
    np.testing.assert_array_equal(bank.train_crf, expected[:-10])
