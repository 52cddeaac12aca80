"""Fused Linearization-Net front end: feature stack + 7x7/2 stem in one pass.

Why this exists (measured on v5e, b128 @ 512^2 bf16 — BENCH_NOTES r4 ledger):
lin is the pipeline's worst floor-ratio stage (194 ms vs a 93 ms counted
floor).  The 93-channel feature stack (image + Sobel + soft histograms at
4/8/16 bins; ops/histogram.py, reference linearization_net.py:310-322) is a
pure function of the 3-channel input, yet the dense path materializes it to
HBM (~6 GB NCHW + an 8.6 GB lane-padded NHWC copy at b128) solely to feed
the stride-2 7x7 stem conv that immediately reduces it to 64 channels at
half resolution.  This kernel computes the features in VMEM and applies the
stem in the same pass: HBM traffic drops to the 3-channel input (read) plus
the 64-channel stem output (write).

Design (channels-major throughout; nothing lane-pads):

  * A cheap XLA prep pass on the 3-channel input (~0.2 GB at b128) pads H
    by the conv halo and splits rows AND columns by parity.  A stride-2
    tap at output col ``ox`` reads input col ``2*ox + kx - 2``, which
    lives at col ``ox + m`` (|m| <= 2) of one column PHASE — so every kx
    tap becomes a static lane ROLL of a phase buffer instead of a stride-2
    lane gather (the lane compaction Mosaic has no cheap form of,
    BENCH_NOTES r3).  Likewise input row ``2*oy + ky`` has row-parity
    ``(ky+1) % 2`` at parity-row ``oy + d(ky)`` — each ky tap is a
    CONTIGUOUS, 128-aligned lane slice of one parity's feature buffer:

        ky       0    1    2    3    4    5    6
        parity   0    1    0    1    0    1    0
        d        2    2    3    3    4    4    5

  * Per grid block the kernel DMAs the two parity slabs (3 colors x 2
    column phases = 6 channels, sublane-padded to 8), computes the
    93-feature stack for the block's halo rows entirely in VMEM (~1 MB per
    (row-parity, col-phase) buffer; Sobel's cross-parity neighbors are
    +-1-parity-row lane slices and +-1-lane rolls), and accumulates the
    stem as 7 ky-major [64, 7*96] x [7*96, TH*WO] MXU matmuls over
    lane-rolled feature slices with SAME-padding edge masks.
  * Eval-mode BatchNorm is affine, so the caller folds it into the conv
    weights/bias (exact); ReLU applies in-register; the output is emitted
    pixels-major ([B, H/2*W/2, 64] == flat NHWC) via the MXU
    identity-matmul transpose (see enc_pool_pallas), ready for the 3x3/2
    max-pool + res1 that follow.

Border ring: the oracle's Sobel uses REFLECT padding, and a zero-padded
image row does not produce zero FEATURES (a zero pixel has nonzero
histogram responses) while the dense path zero-pads the STACK — both
effects are confined to the outermost TWO output rows/cols, which the
wrapper recomputes with the XLA reference on thin strips and pastes over
(the ops/upsample_conv ring-recompute precedent).

Forward-only: training takes the dense path (the gate in
models/linearization.py mirrors hallucination.EncoderStage).  Off-TPU
callers use the identical-math XLA fallback, which is also the test
oracle.  Feature channel order matches ops.histogram.linearization_features
(img 3 | Sobel dy/dx color-major 6 | hists bin-major 12+24+48).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlehdr_tpu.ops.histogram import HISTOGRAM_BINS, N_FEATURES

_VMEM_LIMIT = 64 * 1024 * 1024
FC = 96            # feature channels padded even for the i32 roll view
OUT_F = 64         # stem output channels
_HALO = 3          # extra parity rows DMA'd on each side of a block
RING = 2           # output rows/cols recomputed by the wrapper

# SAME padding for stride 2 / kernel 7 on an even extent is ASYMMETRIC —
# pad_total = 5 splits 2 low / 3 high (XLA and TF agree) — so the tap
# origin is -2, not -3.  ky -> (row parity, parity-row offset d): input
# row 2*oy + ky - 2, padded by 2*_HALO rows, is padded-row
# 2*oy + ky + 4 = 2*(oy + d) + parity:
_KY_TAPS = [(0, 2), (1, 2), (0, 3), (1, 3), (0, 4), (1, 4), (0, 5)]
# kx -> (col phase, lane offset m): input col 2*ox + kx - 2 = 2*(ox+m)+cp.
_KX_TAPS = [(0, (0, -1)), (2, (0, 0)), (4, (0, 1)), (6, (0, 2)),
            (1, (1, -1)), (3, (1, 0)), (5, (1, 1))]


def supported(x_shape: Tuple[int, ...]) -> bool:
    """[B, H, W, 3] with W/2 a lane-tile multiple and H/2 blockable."""
    if len(x_shape) != 4 or x_shape[-1] != 3:
        return False
    _, h, w, _ = x_shape
    return h % 32 == 0 and w % 256 == 0 and _pick_th(h // 2) > 0


def _pick_th(h_out: int) -> int:
    for th in (16, 8):
        if h_out % th == 0:
            return th
    return 0


def _edge_masks(w: int, lanes: int, dtype, dist: int):
    """(left, right) [1, lanes] masks zeroing the ``dist`` lanes a roll
    pulled across a row border (arithmetic form: Mosaic can't relayout
    compare-produced i1 vectors into bf16 tiles)."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % w
    left = jnp.clip(wpos - (dist - 1), 0, 1).astype(dtype)
    right = jnp.clip(w - dist - wpos, 0, 1).astype(dtype)
    return left, right


def _roll(x, shift):
    """Static lane rotation; bf16 rides an i32 view (sublanes must be even)."""
    lanes = x.shape[-1]
    if x.dtype == jnp.bfloat16 and x.shape[0] % 2 == 0:
        v = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(v, shift % lanes, 1), jnp.bfloat16)
    return pltpu.roll(x.astype(jnp.float32), shift % lanes, 1).astype(x.dtype)


def _tap(x, m, masks):
    """Read a phase buffer at col ox+m: roll by -m, zero the lanes that
    crossed a row border (== the dense path's zero-padded stack)."""
    if m == 0:
        return x
    ml, mr = masks[abs(m)]
    return _roll(x, -m) * (mr if m > 0 else ml)


def _rowshift(x, d, wo):
    """Row s of the result = row s+d of x ([c, rows*wo] flat layout);
    vacated rows are zero.  Row offsets are whole lane-tiles (wo % 128
    == 0), so both branches are aligned slices + a zero concat."""
    n = x.shape[-1]
    z = jnp.zeros((x.shape[0], abs(d) * wo), x.dtype)
    if d > 0:
        return jnp.concatenate([x[:, d * wo:], z], axis=1)
    return jnp.concatenate([z, x[:, : n + d * wo]], axis=1)


def _features(img3, dy, dx):
    """[FC, N] stack for one (row-parity, col-phase) buffer: rows 0-2 the
    image, 3-8 Sobel (color-major dy,dx), 9-92 histograms bin-major, then
    zero padding to FC — the exact linearization_features channel order."""
    n = img3.shape[-1]
    parts = [img3]
    parts.append(jnp.stack([dy, dx], axis=1).reshape(6, n))
    for n_bins in HISTOGRAM_BINS:
        for i in range(1, n_bins + 1):
            center = (2.0 * i - 1.0) / (2.0 * n_bins)
            d = jnp.abs(img3 - jnp.asarray(center, img3.dtype))
            parts.append(jnp.maximum(0.0, 1.0 - d * n_bins))
    parts.append(jnp.zeros((FC - N_FEATURES, n), img3.dtype))
    return jnp.concatenate(parts, axis=0)


def _kernel(prep_hbm, w_ref, b_ref, out_ref, slab0, slab1, sem0, sem1,
            *, TH, WO):
    """One block: TH output rows x WO output cols (WO = W/2).

    prep_hbm: [B, 2(row parity), 8, RP*WO], channels col-phase-major
      (cp*3 + color); parity-row p covers padded-input row 2p + parity.
    w_ref: [OUT_F, 7*7*FC] — ky-major, kx taps in _KX_TAPS order, then FC.
    out block: [1, TH*WO, OUT_F] pixels-major (flat NHWC).
    """
    i_b = pl.program_id(0)
    i_h = pl.program_id(1)
    dt = slab0.dtype
    rows = TH + 2 * _HALO
    n = rows * WO

    cp0 = pltpu.make_async_copy(
        prep_hbm.at[i_b, 0, :, pl.ds(i_h * TH * WO, n)], slab0, sem0
    )
    cp1 = pltpu.make_async_copy(
        prep_hbm.at[i_b, 1, :, pl.ds(i_h * TH * WO, n)], slab1, sem1
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

    masks_n = {d: _edge_masks(WO, n, dt, d) for d in (1, 2)}
    masks_t = {d: _edge_masks(WO, TH * WO, dt, d) for d in (1, 2)}

    def sw(v, cp):
        """[1,2,1]-smooth along W of a [6, n] two-phase row source, at the
        pixels of col-phase ``cp`` (taps land on both phases)."""
        v0, v1 = v[0:3, :], v[3:6, :]
        if cp == 0:   # ix-1 -> (cp1, c-1), ix+1 -> (cp1, c)
            return _tap(v1, -1, masks_n) + 2.0 * v0 + v1
        return v0 + 2.0 * v1 + _tap(v0, 1, masks_n)

    slabs = (slab0, slab1)
    feats = {}
    for rp in range(2):
        cur = slabs[rp]
        oth = slabs[1 - rp]
        # padded row 2p+rp: row-1 / row+1 live in the OTHER parity at
        # parity-row p-1|p (rp=0) or p|p+1 (rp=1)
        if rp == 0:
            up, down = _rowshift(oth, -1, WO), oth
        else:
            up, down = oth, _rowshift(oth, 1, WO)
        sh = [
            up[3 * g: 3 * g + 3, :] + 2.0 * cur[3 * g: 3 * g + 3, :]
            + down[3 * g: 3 * g + 3, :]
            for g in range(2)
        ]
        for cp in range(2):
            img = cur[3 * cp: 3 * cp + 3, :]
            dy = sw(down, cp) - sw(up, cp)
            if cp == 0:   # ix+1 -> (cp1, c), ix-1 -> (cp1, c-1)
                dx = sh[1] - _tap(sh[1], -1, masks_n)
            else:         # ix+1 -> (cp0, c+1), ix-1 -> (cp0, c)
                dx = _tap(sh[0], 1, masks_n) - sh[0]
            feats[(rp, cp)] = _features(img, dy, dx)

    acc = jnp.zeros((OUT_F, TH * WO), jnp.float32)
    for ky, (rp, d) in enumerate(_KY_TAPS):
        pieces = []
        for _, (cp, m) in _KX_TAPS:
            f = feats[(rp, cp)][:, d * WO: (d + TH) * WO]
            pieces.append(_tap(f, m, masks_t))
        col = jnp.concatenate(pieces, axis=0)       # [7*FC, TH*WO]
        acc = acc + jax.lax.dot_general(
            w_ref[ :, ky * 7 * FC: (ky + 1) * 7 * FC], col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0).astype(dt)

    # pixels-major emission via the MXU identity transpose.  HIGHEST for f32
    # only (so it is not rounded through one bf16 pass); bf16 is exact with
    # default precision, and Mosaic rejects a multi-pass precision request on
    # bf16 operands ("Bad lhs type", probed 2026-08-20).
    r = jax.lax.broadcasted_iota(jnp.int32, (OUT_F, OUT_F), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (OUT_F, OUT_F), 1)
    eye = (1 - jnp.minimum(jnp.abs(r - c), 1)).astype(out.dtype)
    prec = jax.lax.Precision.HIGHEST if out.dtype == jnp.float32 else None
    out_ref[0] = jax.lax.dot_general(
        out, eye,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def prep_phases(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, 2, 8, RP*(W/2)]: H zero-padded by 2*_HALO rows
    top and bottom, rows and cols split by parity, channels col-phase-major
    (cp*3 + color), sublane-padded 6 -> 8.  RP = H/2 + 2*_HALO."""
    b, h, w, _ = x.shape
    wo = w // 2
    xp = jnp.pad(
        x.astype(dtype), ((0, 0), (2 * _HALO, 2 * _HALO), (0, 0), (0, 0))
    )
    hp = h + 4 * _HALO
    v = xp.reshape(b, hp // 2, 2, wo, 2, 3)        # (b, p, rp, c, cp, ch)
    v = jnp.transpose(v, (0, 2, 4, 5, 1, 3))       # (b, rp, cp, ch, p, c)
    v = v.reshape(b, 2, 6, (hp // 2) * wo)
    return jnp.pad(v, ((0, 0), (0, 0), (0, 2), (0, 0)))


def pack_weights(kernel7: jnp.ndarray, dtype) -> jnp.ndarray:
    """[7,7,93,64] HWIO stem kernel -> [OUT_F, 7*7*FC], ky-major then the
    _KX_TAPS order, input channels padded 93 -> FC."""
    k = jnp.pad(kernel7, ((0, 0), (0, 0), (0, FC - N_FEATURES), (0, 0)))
    cols = [k[ky, kx] for ky in range(7) for kx, _ in _KX_TAPS]
    return jnp.transpose(jnp.concatenate(cols, axis=0)).astype(dtype)


def _xla_reference(x, kernel7, bias):
    """Identical-math XLA path (and the test oracle): the real feature
    stack + stride-2 SAME conv + bias + ReLU."""
    from singlehdr_tpu.ops.histogram import linearization_features

    feats = linearization_features(x)
    y = jax.lax.conv_general_dilated(
        feats, kernel7.astype(feats.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + bias.astype(y.dtype))


@jax.jit
def lin_feature_stem(x: jnp.ndarray, kernel7: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """relu(conv7x7/2(features(x)) + bias), fused; [B, H/2, W/2, 64] NHWC.

    ``kernel7``/``bias`` are the (BN-folded, eval-mode) stem parameters.
    The outermost RING output rows/cols are recomputed with the XLA oracle
    on thin strips (Sobel reflect + zero-pixel-features boundary semantics;
    see module docstring).
    """
    b, h, w, _ = x.shape
    ho, wo = h // 2, w // 2
    dt = x.dtype
    th = _pick_th(ho)
    prep = prep_phases(x, dt)
    wm = pack_weights(kernel7, dt)
    bc = bias.reshape(OUT_F, 1).astype(jnp.float32)
    rows = th + 2 * _HALO
    out = pl.pallas_call(
        functools.partial(_kernel, TH=th, WO=wo),
        grid=(b, ho // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((OUT_F, 7 * 7 * FC), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_F, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * wo, OUT_F), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho * wo, OUT_F), dt),
        scratch_shapes=[
            pltpu.VMEM((8, rows * wo), dt),
            pltpu.VMEM((8, rows * wo), dt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 49 * FC * OUT_F * ho * wo * b,
            bytes_accessed=b * 2 * (h * w * 3 + ho * wo * OUT_F * 2),
            transcendentals=0,
        ),
    )(prep, wm, bc).reshape(b, ho, wo, OUT_F)

    # Border-ring recompute: RING out rows/cols read image borders, where
    # the kernel's zero-halo features differ from the oracle (reflect
    # Sobel; nonzero features of zero pixels).  A strip of S input rows
    # covers the ring's taps (2*(RING-1)+3 conv + 1 Sobel = 6 < S).
    s_in = 4 * RING + 8
    cols = _xla_reference(x[:, :, :s_in], kernel7, bias)[:, :, :RING]
    out = out.at[:, :, :RING].set(cols)
    cols = _xla_reference(x[:, :, -s_in:], kernel7, bias)[:, :, -RING:]
    out = out.at[:, :, -RING:].set(cols)
    rows_ = _xla_reference(x[:, :s_in], kernel7, bias)[:, :RING]
    out = out.at[:, :RING].set(rows_)
    rows_ = _xla_reference(x[:, -s_in:], kernel7, bias)[:, -RING:]
    out = out.at[:, -RING:].set(rows_)
    return out
