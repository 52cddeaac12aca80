#!/usr/bin/env python
"""Quantify the synthesized CRF bank against the measured-EMoR subspace.

The reference samples its CRFs from ``dorfCurves.txt`` (201 measured camera
response functions), a git-LFS blob missing from this environment
(dataset.py:19-35).  ``calib.crf._synthesize_dorf_like`` substitutes curves
sampled from the forward EMoR PCA model — the basis Grossberg & Nayar fit to
the *same* DoRF measurement set — so the synthetic bank should live inside
the measured curves' subspace by construction.  This tool quantifies that:

  * EMoR-25 reconstruction residual of each synthetic curve (how far outside
    the 25-dim measured-curve subspace the bank strays; DoRF curves themselves
    reconstruct to ~1e-3 RMS in published EMoR results),
  * coefficient spread along the first 11 bases vs the spread the
    Linearization-Net can express (its prediction space, lin fc -> 11 PCA
    weights),
  * monotonicity / endpoint discipline (every curve must be a valid CRF),
  * curvature-direction mix (DoRF contains both gamma-like and s-shaped
    curves; a bank of identical gammas would under-train the net).

Run:  python tools/analyze_crf_bank.py   (prints a JSON summary)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from singlehdr_tpu.calib import crf as crf_mod
from singlehdr_tpu.calib.emor import load_emor


def main():
    emor = load_emor()
    curves = crf_mod._synthesize_dorf_like(crf_mod.N_DORF_CURVES)
    n, s = curves.shape
    grid = np.linspace(0.0, 1.0, s, dtype=np.float64)

    basis = emor.basis.astype(np.float64)            # [1024, k_avail]
    mean = emor.mean.astype(np.float64)
    centered = curves.astype(np.float64) - mean
    coeff, *_ = np.linalg.lstsq(basis, centered.T, rcond=None)
    recon = (basis @ coeff).T + mean
    rms = np.sqrt(((curves - recon) ** 2).mean(axis=1))

    k11 = basis[:, :11]
    c11, *_ = np.linalg.lstsq(k11, centered.T, rcond=None)
    recon11 = (k11 @ c11).T + mean
    rms11 = np.sqrt(((curves - recon11) ** 2).mean(axis=1))

    diffs = np.diff(curves, axis=1)
    second = np.diff(curves.astype(np.float64), n=2, axis=1).mean(axis=1)

    summary = {
        "n_curves": int(n),
        "emor_bases_available": int(basis.shape[1]),
        "recon_rms_full_basis": {
            "mean": float(rms.mean()), "max": float(rms.max()),
        },
        "recon_rms_11_bases": {
            "mean": float(rms11.mean()), "max": float(rms11.max()),
        },
        "coeff11_std": [float(x) for x in np.round(c11.std(axis=1), 4)],
        "monotone_fraction": float((diffs >= -1e-6).all(axis=1).mean()),
        "endpoints": {
            "start_absmax": float(np.abs(curves[:, 0]).max()),
            "end_absmax_err": float(np.abs(curves[:, -1] - 1.0).max()),
        },
        "curvature_mix": {
            "concave_fraction": float((second < 0).mean()),
            "convex_fraction": float((second > 0).mean()),
        },
        "identity_rms_spread": {
            "mean": float(np.sqrt(((curves - grid) ** 2).mean(axis=1)).mean()),
            "min": float(np.sqrt(((curves - grid) ** 2).mean(axis=1)).min()),
            "max": float(np.sqrt(((curves - grid) ** 2).mean(axis=1)).max()),
        },
    }
    print(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
