"""Packed-lane convolution: full-MXU convs for small channel counts.

The reference U-Nets (dequantization_net.py:36-47, refinement_net.py:31-66)
spend most of their FLOPs in stages with 3-64 channels.  On TPU a conv's
output channels map to the MXU's 128 lanes, so a C_out=16 stage leaves 7/8 of
the systolic array idle — measured ~6 TFLOP/s vs ~197 peak (BENCH_NOTES.md).

This module fixes the underfill **in pure XLA** by packing ``p = 128 //
C_out`` horizontally-adjacent pixels into the channel (lane) dimension and
running ONE standard convolution over the packed view:

    x  [B, H, W, C]   -> reshape ->  xg [B, H, W/p, p*C]      (free: the NHWC
                                                               flattening of
                                                               (w, c) is
                                                               (w//p, w%p, c))
    w  [kh, kw, C, F] -> expand  ->  wp [kh, G, p*C, p*F]     (block-Toeplitz
                                                               along the lane
                                                               dim, zeros for
                                                               out-of-window
                                                               taps)
    out = conv(xg, wp)[B, H, W/p, p*F] -> reshape -> [B, H, W, F]

``G = ceil((p + kw - 1) / p)`` input pixel-groups cover every tap of every
output pixel in a group (the input is pre-shifted left by ``kw//2`` so group
offsets start at 0).  The zero entries waste ``1 - kw/(G*p)`` of the MACs,
but the MXU runs with all 128 lanes live, and the packed conv is an utterly
ordinary 128-channel convolution that XLA's TPU conv emitter already executes
near peak — no Pallas, no layout churn at kernel boundaries, and autodiff /
SPMD sharding work exactly as for any conv (the round-1 Pallas strip-conv
kernel won standalone but lost end-to-end to pallas_call layout
materializations; this replaces it as the default fast path).

MAC inflation by stage (kw=3): C_out 16 -> 5.33x, 32 -> 2.67x, 64 -> 1.33x;
kw=7 stem -> 2.29x; all far below the 8-21x lane underfill they replace.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

MXU_LANES = 128


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pack_factor(cout: int) -> int:
    """Pixels packed per lane-group so p * pow2(cout) == 128."""
    return MXU_LANES // _ceil_pow2(cout)


def packed_conv_supported(x_shape, cout: int) -> bool:
    """Static check: packing must be >1 pixel and divide W."""
    cp = _ceil_pow2(cout)
    if cp >= MXU_LANES:  # plain conv already fills the lanes
        return False
    p = MXU_LANES // cp
    return x_shape[2] % p == 0


def build_packed_kernel(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """[kh, kw, Cin, Cout] -> block-Toeplitz [kh, G, p*Cin, p*Cout_p].

    With the input pre-shifted left by kw//2, output pixel ``wg*p + dwo``
    consumes shifted-input pixels ``wg*p + dwo + dx`` for tap ``dx`` in
    [0, kw); input pixel ``(wg+g)*p + dwi`` therefore carries tap
    ``dx = dwi + p*g - dwo`` (zero weight when outside [0, kw)).
    """
    kh, kw, cin, cout = w.shape
    cout_p = _ceil_pow2(cout)
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
    n_groups = -(-(p + kw - 1) // p)
    dwi = np.arange(p)[None, :, None]
    g = np.arange(n_groups)[:, None, None]
    dwo = np.arange(p)[None, None, :]
    dx = dwi + p * g - dwo                                # [G, p_in, p_out]
    valid = (dx >= 0) & (dx < kw)
    taps = np.clip(dx, 0, kw - 1)
    wp = w[:, taps]                                       # [kh, G, pi, po, cin, cout_p]
    wp = wp * jnp.asarray(valid[None, :, :, :, None, None], wp.dtype)
    wp = jnp.transpose(wp, (0, 1, 2, 4, 3, 5))            # [kh, G, pi, cin, po, cout_p]
    return wp.reshape(kh, n_groups, p * cin, p * cout_p)


def packed_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    act: Optional[str] = None,
) -> jnp.ndarray:
    """SAME stride-1 conv with the output-pixel dim packed into MXU lanes.

    Args:
      x: [B, H, W, Cin] NHWC; W must be divisible by the pack factor.
      w: [kh, kw, Cin, Cout] HWIO (flax layout).
      b: optional [Cout] bias.
      act: None | 'relu' | 'leaky_relu' | 'tanh' fused activation.

    Returns [B, H, W, Cout] in x.dtype; numerically a standard SAME conv
    (contraction order differs, so ~1 ulp from lax.conv, not bit-exact).
    """
    bsz, h, w_in, cin = x.shape
    kh, kw, wcin, cout = w.shape
    if wcin != cin:
        raise ValueError(f"Cin mismatch: x has {cin}, w has {wcin}")
    if not packed_conv_supported(x.shape, cout):
        raise ValueError(f"packed_conv unsupported for {x.shape} -> {cout}")
    p = pack_factor(cout)
    cout_p = _ceil_pow2(cout)
    ph, pw = kh // 2, kw // 2
    n_groups = -(-(p + kw - 1) // p)
    # Shift right by pw pixels (SAME centering) and extend with zeros so the
    # VALID conv over groups yields exactly W/p output groups.  Both are one
    # jnp.pad on the flat [B, H, W*Cin] view: its minor dim is a multiple of
    # 128 lanes, so the copy runs at full HBM bandwidth — padding the unpacked
    # NHWC array (minor dim Cin) costs ~6x more (measured on v5e).
    lanes = p * cin
    n_ext = w_in // p + n_groups - 1
    flat = x.reshape(bsz, h, w_in * cin)
    shift = pw * cin
    flat = jnp.pad(
        flat, ((0, 0), (0, 0), (shift, n_ext * lanes - w_in * cin - shift))
    )
    xg = flat.reshape(bsz, h, n_ext, lanes)
    wp = build_packed_kernel(w, p).astype(x.dtype)
    out = lax.conv_general_dilated(
        xg,
        wp,
        (1, 1),
        ((ph, ph), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out.reshape(bsz, h, w_in, cout_p)
    if cout_p != cout:
        out = out[..., :cout]
    if b is not None:
        out = out + b.astype(out.dtype)
    if act == "leaky_relu":
        out = jax.nn.leaky_relu(out, 0.1)
    elif act == "relu":
        out = jax.nn.relu(out)
    elif act == "tanh":
        out = jnp.tanh(out)
    elif act is not None:
        raise ValueError(act)
    return out
