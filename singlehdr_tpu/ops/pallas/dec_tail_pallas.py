"""Fused Hallucination-Net decoder tail: dec1 + skip1 + head + skip0, one pass.

Why this exists (measured on v5e, b64 @ 512^2 bf16, BENCH_NOTES r3): after the
encoder chain landed, dec1 is the largest remaining stage (~89 ms pre-fixes at
b64).  Run as separate XLA ops, the tail materializes every 64-channel 512^2
intermediate in NHWC — where bf16 tiles are sublane x 128 lanes, so C=64
tensors pad 2x — and each of (upsample-conv out, BN out, skip-fusion out)
round-trips ~4.3 GB of HBM, ~20 GB of traffic for ~2.7 PFLOP of matmul.  This
kernel computes the whole chain

    y = relu(bn1(relu(upsample_conv3x3(x) + b)))      dec1  (models/
    z = y @ kx + (skip/255) @ ks + bz                 skip1  hallucination.py,
    h = relu(bn2(z @ kh + bh))                        head   hallucination_net
    o = relu(h @ k0x + (bgr/255) @ k0b + b0)          skip0  .py:77-107,179-190)

in one channels-major pass: the only HBM traffic is the low-res input
(~1 GB), the NCHW skip (~2.1 GB), the preprocessed input (~0.1 GB), and the
3-channel output (~0.1 GB).

Design:
  * the upsample+conv pair is the lerp-folded composite conv
    (ops.upsample_conv.composite_kernel): ONE low-res 3x3 conv with 4*F output
    channels, one channel block per high-res phase (h,w parity).  The kernel
    never interleaves phases — every downstream op (bias, BN, ReLU, 1x1
    fusions) is per-pixel/per-channel, so it runs on the phase-major
    [4F, TH*W] block directly, and a tiny XLA depth-to-space on the final
    3-channel output reassembles the image,
  * the conv runs as three accumulated [4F, 3C] x [3C, TH*W] MXU matmuls (one
    per kh tap) from 128-aligned lane slices of the input slab x three lane
    rotations; W edges use *replicate* semantics (tap falls back to the edge
    pixel via the same arithmetic masks as the encoder kernel) because the
    composite conv's pad reproduces the bilinear resize clamp,
  * the skip and the preprocessed bgr arrive pre-phase-split ([B, 4, C, HW]
    — one XLA transpose each, reads that replace the dense path's own reads),
    so every fusion contraction is a full-lane channels-major matmul; the
    /255 skip scales fold into the 1x1 kernels at trace time,
  * the outer 1-pixel high-res ring — where the high-res conv's SAME zero
    padding differs from the resize clamp — is recomputed exactly in XLA from
    thin strips (ops.upsample_conv.upsample_conv_rings) chained through the
    same tail math, and pasted over the kernel's ring values.

Eval-mode only: BN enters as its folded affine (scale/sqrt(var+eps)), and
training forwards take the dense path (models/hallucination.py gates on
``train``), so no custom VJP is needed.  Parity oracle: the dense module path
itself (SINGLEHDR_FUSED_DEC=0); semantics tests run the kernel under the
Pallas interpreter on CPU (rolls switch to jnp.roll there — Mosaic's
lane-rotate primitive has no interpreter lowering).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlehdr_tpu.ops.pallas.enc_pool_pallas import (
    _VMEM_LIMIT,
    _edge_masks,
    _roll1,
)
from singlehdr_tpu.ops.upsample_conv import composite_kernel, upsample_conv_rings

_VMEM_BUDGET = 40 * 1024 * 1024
_BN_EPS = 1e-3  # models/layers.BN_EPSILON


class DecStageParams(NamedTuple):
    """Raw checkpoint-layout weights of one fused decoder stage + skip
    fusion (all f32).  Shapes for dec2 (C=256 in, F=128): kd [3,3,C,F],
    bd [F]; bn mean/var/scale/bias [F]; ksk [1,1,2F,F], bsk [F]."""

    kd: jnp.ndarray
    bd: jnp.ndarray
    bn_scale: jnp.ndarray
    bn_bias: jnp.ndarray
    bn_mean: jnp.ndarray
    bn_var: jnp.ndarray
    ksk: jnp.ndarray
    bsk: jnp.ndarray


class DecTailParams(NamedTuple):
    """Raw checkpoint-layout weights of the fused chain (all f32).

    Shapes for dec1 (C=128 in, F=64): kd [3,3,C,F], bd [F]; bn1 mean/var/
    scale/bias [F]; ksk [1,1,2F,F] (x-half then skip-half), bsk [F];
    kh [1,1,F,3], bh [3]; bn2 mean/var/scale/bias [3]; k0 [1,1,6,3], b0 [3].
    """

    kd: jnp.ndarray
    bd: jnp.ndarray
    bn1_scale: jnp.ndarray
    bn1_bias: jnp.ndarray
    bn1_mean: jnp.ndarray
    bn1_var: jnp.ndarray
    ksk: jnp.ndarray
    bsk: jnp.ndarray
    kh: jnp.ndarray
    bh: jnp.ndarray
    bn2_scale: jnp.ndarray
    bn2_bias: jnp.ndarray
    bn2_mean: jnp.ndarray
    bn2_var: jnp.ndarray
    k0: jnp.ndarray
    b0: jnp.ndarray


def _bn_affine(scale, bias, mean, var):
    s = scale / jnp.sqrt(var + _BN_EPS)
    return s, bias - mean * s


def _vmem_bytes(th: int, c: int, f: int, w: int) -> int:
    bf2 = 2
    slab = c * (th + 2) * w * bf2
    col = 3 * c * th * w * bf2                 # one kh tap's kw-concat
    acc = 4 * f * th * w * 4                   # f32 composite-conv accumulator
    y2 = 4 * f * th * w * bf2
    skip = 4 * f * th * w * bf2
    z = f * th * w * 4
    outs = 2 * 4 * 8 * th * w * bf2
    weights = (4 * f * 9 * c + 2 * f * f) * bf2
    return slab + col + acc + y2 + skip + z + outs + weights


def _pick_th(h: int, c: int, f: int, w: int):
    # blocks must cover whole rows and land on lane-tile boundaries in the
    # flattened [C, R*W] layout; W < 128 works because the kh tap pieces are
    # built by rolling the slab (see _stage_front), not by unaligned slices
    for th in (16, 8):
        if h % th == 0 and (th * w) % 128 == 0 and _vmem_bytes(
            th, c, f, w
        ) < _VMEM_BUDGET:
            return th
    return None


def supported(x_shape: Tuple[int, ...], f: int) -> bool:
    """Static gate for the low-res NCHW input [B, C, H, W] and F channels."""
    if len(x_shape) != 4:
        return False
    b, c, h, w = x_shape
    if not (w % 64 == 0 and c % 8 == 0 and f % 8 == 0 and h % 8 == 0):
        return False
    return _pick_th(h, c, f, w) is not None


def _rolled_taps_replicate(piece, masks, roll):
    """kw in (-1, 0, +1) taps of a [C, R*W] block with *replicate* edges.

    Where a lane rotation crossed a row border (mask 0), the tap falls back
    to the edge pixel itself — matching the composite conv's edge-replicate
    pad (the bilinear resize clamp).  ``left = piece + ml*(roll - piece)``
    is the mask-blend with one fused multiply-add.
    """
    ml, mr = masks
    lanes = piece.shape[-1]
    left = piece + ml[:, :lanes] * (roll(piece, 1) - piece)
    right = piece + mr[:, :lanes] * (roll(piece, -1) - piece)
    return left, piece, right


def _mm(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stage_front(x_hbm, w4_ref, ab1_ref, slab, sem, *, TH, W, C, F, roll):
    """Shared front half of the fused decoder kernels: DMA the input slab,
    run the composite upsample-conv as three accumulated channels-major
    matmuls, and apply bias -> relu -> BN affine -> relu.  Returns the
    phase-major [4F, TH*W] stage activation in the compute dtype."""
    i_b = pl.program_id(0)
    i_h = pl.program_id(1)
    masks = _edge_masks(W, TH * W, slab.dtype)

    cp = pltpu.make_async_copy(
        x_hbm.at[i_b, :, pl.ds(i_h * TH * W, (TH + 2) * W)], slab, sem
    )
    cp.start()
    cp.wait()

    # composite conv: out1[4F, THW] = sum_kh w4[:, kh] @ col_kh[3C, THW]
    out1 = jnp.zeros((4 * F, TH * W), jnp.float32)
    for kh in range(3):
        if (kh * W) % 128 == 0:
            piece = slab[:, pl.ds(kh * W, TH * W)]
        else:
            # W < 128: the kh-row offset is not lane-tile-aligned, so shift
            # the whole slab with a (cheap, VPU) rotate and take the aligned
            # prefix — the wrapped tail lands past TH*W and is discarded
            piece = roll(slab[:], -kh * W)[:, :TH * W]
        col = jnp.concatenate(
            _rolled_taps_replicate(piece, masks, roll), axis=0
        )
        out1 = out1 + _mm(w4_ref[:, pl.ds(kh * 3 * C, 3 * C)], col)
    # bias -> relu -> BN affine -> relu, phase-tiled per-channel rows
    bd4, s1, t1 = ab1_ref[:, 0:1], ab1_ref[:, 1:2], ab1_ref[:, 2:3]
    y2 = jnp.maximum(jnp.maximum(out1 + bd4, 0.0) * s1 + t1, 0.0)
    return y2.astype(slab.dtype)


def _stage_kernel(
    x_hbm, w4_ref, ab1_ref, kx_ref, ks_ref, skip_ref, out_ref, slab, sem,
    *, TH, W, C, F, roll,
):
    """Fused decoder stage without the 3-channel tail: the skip-fused
    activation z is the output, one phase-major [F, THW] block per phase."""
    y2 = _stage_front(
        x_hbm, w4_ref, ab1_ref, slab, sem, TH=TH, W=W, C=C, F=F, roll=roll
    )
    bsk = ab1_ref[: F, 3:4]
    for p in range(4):
        z = _mm(kx_ref[:], y2[p * F:(p + 1) * F])
        z = z + _mm(ks_ref[:], skip_ref[0, p])
        out_ref[0, p] = (z + bsk).astype(out_ref.dtype)


def _kernel(
    x_hbm, w4_ref, ab1_ref, kx_ref, ks_ref, kh_ref, ab2_ref, k0x_ref,
    k0b_ref, ab0_ref, skip_ref, bgr_ref, out_ref, slab, sem,
    *, TH, W, C, F, roll,
):
    y2 = _stage_front(
        x_hbm, w4_ref, ab1_ref, slab, sem, TH=TH, W=W, C=C, F=F, roll=roll
    )
    bsk = ab1_ref[: F, 3:4]
    bh8 = ab2_ref[:, 0:1]
    s2, t2 = ab2_ref[:, 1:2], ab2_ref[:, 2:3]
    b08 = ab0_ref[:, 0:1]
    for p in range(4):
        # skip1 fusion: z = kx @ y2_p + (ks/255) @ skip_p + bsk
        z = _mm(kx_ref[:], y2[p * F:(p + 1) * F])
        z = z + _mm(ks_ref[:], skip_ref[0, p])
        z = (z + bsk).astype(y2.dtype)
        # head conv -> BN affine -> relu (rows 3..7 are zero padding)
        h = _mm(kh_ref[:], z)
        h = jnp.maximum((h + bh8) * s2 + t2, 0.0).astype(y2.dtype)
        # skip0 narrow fusion with the preprocessed bgr, then final relu
        o = _mm(k0x_ref[:], h) + _mm(k0b_ref[:], bgr_ref[0, p])
        out_ref[0, p] = jnp.maximum(o + b08, 0.0).astype(out_ref.dtype)


def _phase_split(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] -> [B, 4, C, (H/2)*(W/2)], phase-major (h parity, w
    parity) matching ops.upsample_conv.composite_kernel's phase order."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return x.reshape(b, 4, c, (h // 2) * (w // 2))


def _phase_merge(o: jnp.ndarray, h2: int, w2: int) -> jnp.ndarray:
    """[B, 4, C, h2*w2] -> [B, C, 2*h2, 2*w2] (inverse of _phase_split)."""
    b, _, c, _ = o.shape
    o = o.reshape(b, 2, 2, c, h2, w2)
    o = jnp.transpose(o, (0, 3, 4, 1, 5, 2))
    return o.reshape(b, c, 2 * h2, 2 * w2)


def _stage_affines(kd, bd, bn, ksk, bsk, dt):
    """Fold the stage's biases/BN into the matmul-operand tables: returns
    (w4m [4F, 9C], ab1 [4F, 4] = (bias4 | s1 | t1 | bsk-pad), kxT [F, F],
    ksT [F, F] with /255 folded in), kernels in the compute dtype."""
    C, F = kd.shape[2], kd.shape[3]
    k4 = composite_kernel(kd)                         # [3,3,C,4F] f32
    w4m = jnp.transpose(k4.reshape(9 * C, 4 * F)).astype(dt)
    s1, t1 = _bn_affine(*bn)
    tile4 = lambda v: jnp.tile(v, 4)[:, None].astype(jnp.float32)
    bsk_col = jnp.concatenate([bsk, jnp.zeros(3 * F)])[:, None]
    ab1 = jnp.concatenate(
        [tile4(bd), tile4(s1), tile4(t1), bsk_col.astype(jnp.float32)], axis=1
    )
    kxT = jnp.transpose(ksk[0, 0, :F]).astype(dt)     # [F, F]
    ksT = jnp.transpose(ksk[0, 0, F:] / 255.0).astype(dt)
    return w4m, ab1, kxT, ksT


def _tail_affines(p: DecTailParams, F: int, dt):
    """Fold biases/BN/scales into the matmul-operand tables the kernel reads.

    Returns (w4m, ab1, kxT, ksT, khT, ab2, k0xT, k0bT, ab0) — transposed
    1x1 kernels in the compute dtype with /255 folded in, and f32 per-channel
    column tables: ab1 [4F, 4] = (bias4 | s1 | t1 | bsk-pad), ab2 [8, 3] =
    (bh | s2 | t2), ab0 [8, 1] = b0."""
    w4m, ab1, kxT, ksT = _stage_affines(
        p.kd, p.bd, (p.bn1_scale, p.bn1_bias, p.bn1_mean, p.bn1_var),
        p.ksk, p.bsk, dt,
    )
    pad8 = lambda m: jnp.pad(m, ((0, 8 - m.shape[0]), (0, 8 - m.shape[1])))
    khT = jnp.pad(jnp.transpose(p.kh[0, 0]), ((0, 5), (0, 0))).astype(dt)
    s2, t2 = _bn_affine(p.bn2_scale, p.bn2_bias, p.bn2_mean, p.bn2_var)
    col8 = lambda v: jnp.pad(v, (0, 5))[:, None].astype(jnp.float32)
    ab2 = jnp.concatenate([col8(p.bh), col8(s2), col8(t2)], axis=1)
    k0xT = pad8(jnp.transpose(p.k0[0, 0, :3])).astype(dt)
    k0bT = pad8(jnp.transpose(p.k0[0, 0, 3:] / 255.0)).astype(dt)
    ab0 = col8(p.b0)
    return w4m, ab1, kxT, ksT, khT, ab2, k0xT, k0bT, ab0


def _stage_chain_nhwc(y, skip, kd, bd, bn, ksk, bsk, dt):
    """The stage's post-conv chain on NHWC strips (XLA; border rings):
    bias -> relu -> BN affine -> relu -> skip fusion.  ``y`` is the raw
    upsample-conv output (no bias); ``skip`` the matching NHWC strip."""
    s1, t1 = _bn_affine(*bn)
    y = jnp.maximum(y + bd.astype(dt), 0.0)
    y = jnp.maximum(y * s1.astype(dt) + t1.astype(dt), 0.0)
    F = kd.shape[3]
    z = jnp.einsum("bhwc,co->bhwo", y, ksk[0, 0, :F].astype(dt))
    z = z + jnp.einsum(
        "bhwc,co->bhwo", skip.astype(dt), (ksk[0, 0, F:] / 255.0).astype(dt)
    )
    return z + bsk.astype(dt)


def _tail_chain_nhwc(y, skip, bgr, p: DecTailParams, dt):
    """The full tail chain on NHWC strips (XLA; used for the border rings).

    ``y`` is the raw upsample-conv output (no bias); skip/bgr are the
    matching NHWC strips.  Same math as the kernel, same compute dtype.
    """
    z = _stage_chain_nhwc(
        y, skip, p.kd, p.bd,
        (p.bn1_scale, p.bn1_bias, p.bn1_mean, p.bn1_var), p.ksk, p.bsk, dt,
    )
    h = jnp.einsum("bhwc,co->bhwo", z, p.kh[0, 0].astype(dt)) + p.bh.astype(dt)
    s2, t2 = _bn_affine(p.bn2_scale, p.bn2_bias, p.bn2_mean, p.bn2_var)
    h = jnp.maximum(h * s2.astype(dt) + t2.astype(dt), 0.0)
    o = jnp.einsum("bhwc,co->bhwo", h, p.k0[0, 0, :3].astype(dt))
    o = o + jnp.einsum(
        "bhwc,co->bhwo", bgr.astype(dt), (p.k0[0, 0, 3:] / 255.0).astype(dt)
    )
    return jnp.maximum(o + p.b0.astype(dt), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec_tail_fused(
    x: jnp.ndarray,
    skip: jnp.ndarray,
    bgr: jnp.ndarray,
    params: DecTailParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dec1 + skip1 + head + skip0 forward (eval mode).

    Args:
      x: [B, C, H, W] NCHW low-res decoder input (dec2+skip2 output).
      skip: [B, F, 2H, 2W] NCHW enc1 skip (pre-pool activation).
      bgr: [B, 2H, 2W, 3] NHWC VGG-preprocessed input (skip0's operand).
      params: raw checkpoint-layout weights (DecTailParams).
      interpret: run under the Pallas interpreter (CPU semantics tests);
        lane rotations switch to jnp.roll there.

    Returns: [B, 2H, 2W, 3] NHWC — relu'd BGR residual, x.dtype.
    """
    B, C, H, W = x.shape
    F = params.kd.shape[3]
    dt = x.dtype
    TH = _pick_th(H, C, F, W)
    w4m, ab1, kxT, ksT, khT, ab2, k0xT, k0bT, ab0 = _tail_affines(params, F, dt)

    # low-res input: H edge-padded by the conv halo (the resize clamp),
    # rows flattened into lanes
    xs = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    xs = xs.reshape(B, C, (H + 2) * W)
    skip_p = _phase_split(skip.astype(dt))            # [B, 4, F, HW]
    bgr_nchw = jnp.transpose(bgr.astype(dt), (0, 3, 1, 2))
    bgr_p = _phase_split(jnp.pad(bgr_nchw, ((0, 0), (0, 5), (0, 0), (0, 0))))

    roll = (lambda v, s: jnp.roll(v, s, axis=-1)) if interpret else _roll1
    kernel = functools.partial(
        _kernel, TH=TH, W=W, C=C, F=F, roll=roll
    )
    grid = (B, H // TH)
    hw = TH * W
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const((4 * F, 9 * C)),
            const((4 * F, 4)),
            const((F, F)),
            const((F, F)),
            const((8, F)),
            const((8, 3)),
            const((8, 8)),
            const((8, 8)),
            const((8, 1)),
            pl.BlockSpec((1, 4, F, hw), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, hw), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 8, hw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, 8, H * W), dt),
        scratch_shapes=[
            pltpu.VMEM((C, (TH + 2) * W), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * B * (9 * C * 4 * F + 8 * F * F),
            bytes_accessed=B * H * W * 2 * (C + 8 * F + 2 * 16),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, w4m, ab1, kxT, ksT, khT, ab2, k0xT, k0bT, ab0, skip_p, bgr_p)

    o = _phase_merge(out[:, :, :3], H, W)             # [B, 3, 2H, 2W]

    # exact border rings: the high-res conv's SAME zero pad differs from the
    # composite conv's resize clamp on the outermost pixel; recompute in XLA
    # through the same tail math and paste (W rings last — they own corners)
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    kd = params.kd.astype(dt)
    y_t, y_b, y_l, y_r = upsample_conv_rings(x_nhwc, kd)
    s_nhwc = lambda s: jnp.transpose(s, (0, 2, 3, 1)).astype(dt)
    to_cw = lambda v: jnp.transpose(v, (0, 3, 1, 2))
    o_t = _tail_chain_nhwc(y_t, s_nhwc(skip[:, :, :1]), bgr[:, :1], params, dt)
    o_b = _tail_chain_nhwc(y_b, s_nhwc(skip[:, :, -1:]), bgr[:, -1:], params, dt)
    o_l = _tail_chain_nhwc(y_l, s_nhwc(skip[:, :, :, :1]), bgr[:, :, :1], params, dt)
    o_r = _tail_chain_nhwc(y_r, s_nhwc(skip[:, :, :, -1:]), bgr[:, :, -1:], params, dt)
    o = o.at[:, :, :1].set(to_cw(o_t))
    o = o.at[:, :, -1:].set(to_cw(o_b))
    o = o.at[:, :, :, :1].set(to_cw(o_l))
    o = o.at[:, :, :, -1:].set(to_cw(o_r))
    return jnp.transpose(o, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec_stage_fused(
    x: jnp.ndarray,
    skip: jnp.ndarray,
    params: DecStageParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decoder stage + skip fusion forward (eval mode), NCHW chain.

    Computes ``z = relu(bn(relu(upsample_conv3x3(x) + b))) @ kx +
    (skip/255) @ ks + bz`` — one DecoderStage + SkipFusion pair
    (hallucination_net.py:77-107) — in one channels-major Pallas pass.

    Args:
      x: [B, C, H, W] NCHW low-res stage input.
      skip: [B, F, 2H, 2W] NCHW encoder skip (pre-pool activation).
      params: raw checkpoint-layout weights (DecStageParams).
      interpret: run under the Pallas interpreter (CPU semantics tests).

    Returns: [B, F, 2H, 2W] NCHW (chains into the next fused stage), x.dtype.
    """
    B, C, H, W = x.shape
    F = params.kd.shape[3]
    dt = x.dtype
    TH = _pick_th(H, C, F, W)
    bn = (params.bn_scale, params.bn_bias, params.bn_mean, params.bn_var)
    w4m, ab1, kxT, ksT = _stage_affines(
        params.kd, params.bd, bn, params.ksk, params.bsk, dt
    )

    xs = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    xs = xs.reshape(B, C, (H + 2) * W)
    skip_p = _phase_split(skip.astype(dt))            # [B, 4, F, HW]

    roll = (lambda v, s: jnp.roll(v, s, axis=-1)) if interpret else _roll1
    kernel = functools.partial(
        _stage_kernel, TH=TH, W=W, C=C, F=F, roll=roll
    )
    grid = (B, H // TH)
    hw = TH * W
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const((4 * F, 9 * C)),
            const((4 * F, 4)),
            const((F, F)),
            const((F, F)),
            pl.BlockSpec((1, 4, F, hw), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, F, hw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, F, H * W), dt),
        scratch_shapes=[
            pltpu.VMEM((C, (TH + 2) * W), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * B * (9 * C * 4 * F + 8 * F * F),
            bytes_accessed=B * H * W * 2 * (C + 12 * F),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, w4m, ab1, kxT, ksT, skip_p)

    z = _phase_merge(out, H, W)                       # [B, F, 2H, 2W]

    # exact border rings, recomputed in XLA through the same stage math
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    kd = params.kd.astype(dt)
    y_t, y_b, y_l, y_r = upsample_conv_rings(x_nhwc, kd)
    s_nhwc = lambda s: jnp.transpose(s, (0, 2, 3, 1)).astype(dt)
    to_cw = lambda v: jnp.transpose(v, (0, 3, 1, 2))
    chain = lambda y, s: _stage_chain_nhwc(
        y, s, params.kd, params.bd, bn, params.ksk, params.bsk, dt
    )
    z = z.at[:, :, :1].set(to_cw(chain(y_t, s_nhwc(skip[:, :, :1]))))
    z = z.at[:, :, -1:].set(to_cw(chain(y_b, s_nhwc(skip[:, :, -1:]))))
    z = z.at[:, :, :, :1].set(to_cw(chain(y_l, s_nhwc(skip[:, :, :, :1]))))
    z = z.at[:, :, :, -1:].set(to_cw(chain(y_r, s_nhwc(skip[:, :, :, -1:]))))
    return z
