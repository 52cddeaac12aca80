"""Camera response-function calibration data (EMoR / inverse-EMoR / DoRF)."""

from singlehdr_tpu.calib.emor import (
    EmorModel,
    load_emor,
    load_inverse_emor,
    parse_emor_text,
)
from singlehdr_tpu.calib.crf import (
    CrfBank,
    get_crf_bank,
    get_exposure_ladder,
    inverse_response,
)

__all__ = [
    "EmorModel",
    "load_emor",
    "load_inverse_emor",
    "parse_emor_text",
    "CrfBank",
    "get_crf_bank",
    "get_exposure_ladder",
    "inverse_response",
]
