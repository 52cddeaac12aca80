"""Regression gate on the trained-quality anchor artifact.

tools/quality_anchor.py runs the full recipe (pretrain -> joint -> finetune ->
evaluate) at reduced-but-non-toy scale on TPU and writes QUALITY_r*.json at
the repo root.  When such an artifact is committed, this gate keeps later
rounds from silently regressing the trained pipeline's quality.  Skipped when
no artifact exists (e.g. fresh clones without TPU access).
"""

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Floors ~1 dB / 0.01 below the measured r5 anchor (26.56 dB mu-PSNR /
# 0.959 mu-SSIM — QUALITY_r05.json extension run; the r5 FRESH run
# measured 24.21/0.949, and the untrained pipeline 12.5/0.837) so ordinary
# run-to-run noise passes but a semantic regression (loss mis-wiring,
# broken restore, channel swaps) fails.  Raise whenever a new anchor
# improves the artifact.
MIN_PSNR_MU = 25.5
MIN_SSIM_MU = 0.948
# Linear-domain floor (VERDICT r4 weak #3: absolute radiance scale is what
# HDR reconstruction is FOR).  r5 measured 15.67 dB; the floor sits ~1 dB
# under the latest artifact's value and must be RAISED whenever a new
# anchor improves it.
MIN_PSNR_LINEAR = 14.6


def _latest_artifact():
    paths = sorted(glob.glob(os.path.join(ROOT, "QUALITY_r*.json")))
    return paths[-1] if paths else None


def test_quality_anchor_gate():
    path = _latest_artifact()
    if path is None:
        pytest.skip("no QUALITY_r*.json artifact present")
    with open(path) as f:
        q = json.load(f)
    assert q["psnr_mu"] is not None and q["ssim_mu"] is not None
    assert q["psnr_mu"] >= MIN_PSNR_MU, f"mu-PSNR regressed: {q['psnr_mu']}"
    assert q["ssim_mu"] >= MIN_SSIM_MU, f"mu-SSIM regressed: {q['ssim_mu']}"
    assert q.get("psnr_linear") is not None, "artifact missing psnr_linear"
    assert q["psnr_linear"] >= MIN_PSNR_LINEAR, (
        f"linear PSNR regressed: {q['psnr_linear']}"
    )
