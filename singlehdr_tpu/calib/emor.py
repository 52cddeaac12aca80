"""EMoR / inverse-EMoR response-curve model.

The EMoR model (Grossberg & Nayar, "Modeling the Space of Camera Response
Functions") represents a camera response function (CRF) f and its inverse g as a
mean curve plus a low-dimensional PCA expansion over 1024 samples:

    f(x) ~ f0 + H  @ w        (forward CRF,  ``emor.txt``)
    g(y) ~ g0 + Hinv @ w      (inverse CRF, ``invemor.txt``)

The reference parses these text files on every forward pass of its
Linearization-Net (``/root/reference/linearization_net.py:217-268`` — it re-reads
``invemor.txt`` from disk *inside* ``call``).  Here the curves are parsed once,
cached as a compressed ``.npz`` next to this module, and exposed as plain numpy
arrays that callers close over as jit-time constants.

Text format (both files): blocks tagged ``E =`` / ``f0 =`` / ``h(i)=`` (forward)
and ``B =`` / ``g0 =`` / ``hinv(i)=`` (inverse), each followed by 256 lines of 4
whitespace-separated floats (1024 samples).  25 basis curves are stored; the
reference uses the first 11 (``linearization_net.py:185,225``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List

import numpy as np

_SAMPLES = 1024
_LINES_PER_BLOCK = _SAMPLES // 4
_N_BASES_STORED = 25

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
_NPZ_PATH = os.path.join(_DATA_DIR, "emor.npz")


@dataclasses.dataclass(frozen=True)
class EmorModel:
    """A (possibly inverse) EMoR response model.

    Attributes:
      x:     [1024] the sample grid (irradiance ``E`` for forward, brightness
             ``B`` for inverse) — uniform on [0, 1].
      mean:  [1024] the mean curve (``f0`` or ``g0``).
      basis: [1024, n_bases] PCA basis curves (``h(i)`` or ``hinv(i)``),
             column i is the i-th basis.
    """

    x: np.ndarray
    mean: np.ndarray
    basis: np.ndarray

    @property
    def n_bases(self) -> int:
        return self.basis.shape[1]

    def curve(self, w: np.ndarray) -> np.ndarray:
        """Reconstruct curve(s) ``mean + basis @ w`` for weights [..., k], k <= n_bases."""
        w = np.asarray(w, np.float32)
        k = w.shape[-1]
        return self.mean + w @ self.basis[:, :k].T


def _parse_block(lines: List[str], tag: str) -> np.ndarray:
    """Parse one 1024-sample block following the line equal to ``tag``.

    Mirrors the reference's `_parse` (``linearization_net.py:255-268``) behavior:
    the tag line is matched exactly after stripping, and the following 256 lines
    hold 4 floats each.
    """
    try:
        start = lines.index(tag) + 1
    except ValueError as e:
        raise ValueError(f"tag {tag!r} not found in EMoR text") from e
    vals: List[str] = []
    for line in lines[start : start + _LINES_PER_BLOCK]:
        vals += line.split()
    if len(vals) != _SAMPLES:
        raise ValueError(f"block {tag!r}: expected {_SAMPLES} values, got {len(vals)}")
    return np.asarray(vals, dtype=np.float32)


def parse_emor_text(path: str, inverse: bool) -> EmorModel:
    """Parse ``emor.txt`` (forward) or ``invemor.txt`` (inverse) into an EmorModel."""
    with open(path, "r") as f:
        lines = [line.strip() for line in f.readlines()]
    if inverse:
        x_tag, mean_tag, basis_fmt = "B =", "g0 =", "hinv({})="
    else:
        x_tag, mean_tag, basis_fmt = "E =", "f0 =", "h({})="
    x = _parse_block(lines, x_tag)
    mean = _parse_block(lines, mean_tag)
    basis = np.stack(
        [_parse_block(lines, basis_fmt.format(i + 1)) for i in range(_N_BASES_STORED)],
        axis=-1,
    )
    return EmorModel(x=x, mean=mean, basis=basis)


def build_npz(emor_txt: str, invemor_txt: str, out_path: str = _NPZ_PATH) -> str:
    """One-time conversion of the EMoR text files into the packaged ``.npz``."""
    fwd = parse_emor_text(emor_txt, inverse=False)
    inv = parse_emor_text(invemor_txt, inverse=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        e=fwd.x, f0=fwd.mean, h=fwd.basis,
        b=inv.x, g0=inv.mean, hinv=inv.basis,
    )
    return out_path


_CACHE: Dict[bool, EmorModel] = {}


def _load(inverse: bool) -> EmorModel:
    if inverse not in _CACHE:
        if not os.path.exists(_NPZ_PATH):
            raise FileNotFoundError(
                f"{_NPZ_PATH} missing — run tools/build_calib.py to generate it "
                "from emor.txt / invemor.txt"
            )
        z = np.load(_NPZ_PATH)
        if inverse:
            _CACHE[True] = EmorModel(x=z["b"], mean=z["g0"], basis=z["hinv"])
        else:
            _CACHE[False] = EmorModel(x=z["e"], mean=z["f0"], basis=z["h"])
    return _CACHE[inverse]


def load_emor() -> EmorModel:
    """The forward EMoR model (f0 + H w)."""
    return _load(inverse=False)


def load_inverse_emor() -> EmorModel:
    """The inverse EMoR model (g0 + Hinv w) used by the Linearization-Net decoder."""
    return _load(inverse=True)
