"""Fused U-Net encoder-stage Pallas kernel: leaky-ReLU conv x2 + 2x2 avg-pool.

Generalizes the hal-net VGG stage kernel (ops/pallas/enc_pool_pallas.py:
conv3x3/ReLU x2 + max-pool) to the Dequantization/Refinement U-Net encoder
geometry (dequantization_net.py:31-47, refinement_net.py:31-47): SAME convs
with K in {3, 5, 7}, leaky-ReLU(0.1), and the reference's non-overlapping 2x2
*average* pool.  Why: at the bench shapes (b64+ @ 512^2) the U-Nets run dense
NHWC convs whose C = 3/16/32 tensors lane-pad 8-42x (bf16 tiles are
sublane x 128 lanes), so the encoder runs far over its HBM roofline — the
same pathology the fused hal encoder chain fixed for C = 64 (BENCH_NOTES r3).
Everything here stays **channels-major** so no tensor ever pads:

  * stage input is NCHW with H zero-padded by 2R rows (R = (K-1)//2) top and
    bottom, C sublane-tile-padded, flattened to [B, C, Hp*W]; one grid step
    DMAs its (TH+4R)-row slab as a single lane-contiguous slice — both
    convs' halos included, rows arriving pre-zeroed,
  * conv1 runs for the whole block as ONE [F, K^2 C] x [K^2 C, (TH+2R)W] MXU
    matmul, the im2col matrix built from K 128-aligned lane slices of the
    slab (kh taps) x K lane rotations with edge masks (kw taps); the conv1
    activation lives only in VMEM,
  * conv2 accumulates K [F, K F] x [K F, TH*W] matmuls (one per kh tap),
  * the avg-pool's H-reduction folds into the same pass in f32 ((row pair
    sum)/2 + even-row selection, lane-tile aligned); the W-pair mean runs
    as one tiny XLA reshape-mean on the 4x-smaller half-pooled tensor,
  * both HBM writes (stage activation = the U-Net skip, half-pooled next
    input) are NCHW: stages chain without transposes.

F is small here (16-32 on the wide stages), so the conv matmuls underfill
the MXU's 128-row output dim — but these stages are HBM-bound, not
MXU-bound, and the traffic shrinks ~8x.  Measured 2026-08-19 (BENCH_NOTES
"Round-4: fused U-Net encoder A/B"): the full 4-net pipeline runs 125.5
img/s with this kernel vs 61.5 dense at b128 @ 512^2 (2.04x) and 82.6 vs
81.3 at b32 (wash), at zero arena cost at b128 (+1.4 GiB at b32, inside
the budget gate) — kept, default-on, bounded per stage by
models/unet._fused_unet_budget.  Mosaic gotchas inherited from the hal kernel: lane rotate is
32-bit-only (bf16 rolls run on an i32 view), compare-produced i1 vectors
can't relayout (edge masks are arithmetic), HBM slices must be
lane-tile-aligned, lane-dim reshapes are relayouts so the kernel never
reshapes.

Semantics are exactly ``avg_pool_2x2(lrelu(conv2(lrelu(conv1(x)))))`` with
SAME padding, the activation being the pre-pool tensor (the U-Net skip).
Forward-only: training forwards take the dense/packed path
(models/unet.ResidualUNet gates on ``train``), so no custom VJP is needed.
Off-TPU callers use the identical-math XLA fallback below.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.1  # models/layers.LEAKY_SLOPE

_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 40 * 1024 * 1024


def _pad_c(c: int) -> int:
    return c if c % 8 == 0 else c + (8 - c % 8)


def _vmem_bytes(th: int, c: int, f: int, w: int, k: int) -> int:
    """Peak-VMEM estimate at block height ``th`` (each live buffer once)."""
    r = (k - 1) // 2
    bf2 = 2
    slab = c * (th + 4 * r) * w * bf2
    col1 = k * k * c * (th + 2 * r) * w * bf2
    c1buf = f * (th + 2 * r) * w * bf2
    acc = th * w * f * 4                        # f32 conv2 accumulator
    piece = k * f * th * w * bf2                # one kh tap's kw-concat
    outs = (th * w * f + (th // 2) * w * f) * bf2
    weights = (f * k * k * c + k * k * f * f) * bf2
    return slab + col1 + c1buf + acc + piece + outs + weights


def _pick_th(h: int, c: int, f: int, w: int, k: int):
    for th in (32, 16, 8):
        if h % th == 0 and _vmem_bytes(th, c, f, w, k) < _VMEM_BUDGET:
            return th
    return None


def supported(x_shape: Tuple[int, ...], kernel: int, f: int, nchw: bool = False) -> bool:
    """Static gate for stage input [B, H, W, C] (or [B, C, H, W])."""
    if len(x_shape) != 4 or kernel not in (3, 5, 7):
        return False
    if nchw:
        b, c, h, w = x_shape
    else:
        b, h, w, c = x_shape
    if not (w % 128 == 0 and f % 8 == 0 and h % 16 == 0):
        return False
    return _pick_th(h, _pad_c(c), f, w, kernel) is not None


def _edge_masks(w, lanes, dtype, r):
    """Per-shift multiplicative edge masks of shape [1, lanes].

    ``left[s-1]`` zeroes lanes a right-rotation by s carried across a row
    border (w < s); ``right[s-1]`` the mirror (w >= W-s).  Arithmetic (clip)
    instead of compare+select: Mosaic cannot relayout the i1 vectors a
    compare produces into 16x128 bf16 tiles."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % w
    left = [jnp.clip(wpos - (s - 1), 0, 1).astype(dtype) for s in range(1, r + 1)]
    right = [jnp.clip(w - s - wpos, 0, 1).astype(dtype) for s in range(1, r + 1)]
    return left, right


def _roll1(x, shift):
    """Lane rotation by a static shift.  Mosaic's rotate is 32-bit-only, so
    bf16 data rotates as an i32 view (adjacent sublane pairs pack into one
    word; lanes shift identically)."""
    lanes = x.shape[-1]
    if x.dtype == jnp.bfloat16 and x.shape[0] % 2 == 0:
        v = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(v, shift % lanes, 1), jnp.bfloat16)
    return pltpu.roll(x.astype(jnp.float32), shift % lanes, 1).astype(x.dtype)


def _tapped(piece, masks):
    """kw in (-R..+R) tap views of a [C, rows*W] block, zeroed at row edges
    (SAME horizontal padding)."""
    left, right = masks
    r = len(left)
    lanes = piece.shape[-1]
    taps = []
    for s in range(r, 0, -1):
        taps.append(_roll1(piece, s) * left[s - 1][:, :lanes])
    taps.append(piece)
    for s in range(1, r + 1):
        taps.append(_roll1(piece, -s) * right[s - 1][:, :lanes])
    return taps


def _leaky(v):
    return jnp.maximum(v, v * LEAKY_SLOPE)


def _kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, hpool_ref, act_ref, slab, c1buf,
    sem, *, TH, W, F, NH, K,
):
    R = (K - 1) // 2
    i_b = pl.program_id(0)
    i_h = pl.program_id(1)
    r1 = TH + 2 * R                            # conv1 rows computed
    masks = _edge_masks(W, r1 * W, slab.dtype, R)

    cp = pltpu.make_async_copy(
        x_hbm.at[i_b, :, pl.ds(i_h * TH * W, (TH + 4 * R) * W)], slab, sem
    )
    cp.start()
    cp.wait()

    # conv1: one [F, K^2 C] x [K^2 C, r1*W] matmul over the whole block
    parts = []
    for dh in range(K):                        # kh-major, then kw, C blocks
        piece = slab[:, pl.ds(dh * W, r1 * W)]
        parts.extend(_tapped(piece, masks))
    col1 = jnp.concatenate(parts, axis=0)      # [K^2 C, r1*W]
    out1 = jax.lax.dot_general(
        w1_ref[:], col1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [F, r1*W]
    out1 = _leaky(out1 + b1_ref[:].astype(jnp.float32))
    c1buf[:] = out1.astype(c1buf.dtype)

    # rows beyond the image top/bottom must be zero for conv2's SAME pad
    # (the zero-padded input makes them lrelu(bias) instead)
    @pl.when(i_h == 0)
    def _():
        c1buf[:, pl.ds(0, R * W)] = jnp.zeros((F, R * W), c1buf.dtype)

    @pl.when(i_h == NH - 1)
    def _():
        c1buf[:, pl.ds((r1 - R) * W, R * W)] = jnp.zeros((F, R * W), c1buf.dtype)

    # conv2, channels-major: out2[F, THW] = sum_kh w2tap[F, KF] @ col[KF, THW]
    out2 = jnp.zeros((F, TH * W), jnp.float32)
    for dh in range(K):
        piece = c1buf[:, pl.ds(dh * W, TH * W)]
        col = jnp.concatenate(_tapped(piece, masks), axis=0)  # [KF, THW]
        out2 = out2 + jax.lax.dot_general(
            w2_ref[:, pl.ds(dh * K * F, K * F)], col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out2 = _leaky(out2 + b2_ref[:].astype(jnp.float32))
    act_ref[0] = out2.astype(act_ref.dtype)    # [F, THW] — the U-Net skip

    # avg-pool H-reduction in f32: mean row pairs, keep even rows — every
    # slice is a 128-aligned lane-tile slice (W % 128 == 0), no relayouts
    hm = (out2 + _roll1(out2, -W)) * 0.5
    rows = [hm[:, 2 * t * W:(2 * t + 1) * W] for t in range(TH // 2)]
    hpool_ref[0] = jnp.concatenate(rows, axis=1).astype(hpool_ref.dtype)


def _xla_reference(x_nhwc, w1, b1, w2, b2):
    """Identical-math XLA path (and test oracle): NHWC in, NHWC out.

    Must equal models/unet.DownStage's conv pair + the entry avg-pool of the
    next stage: leaky-ReLU(0.1) convs, avg_pool_2x2 reshape-mean."""
    y = x_nhwc
    for w, b in ((w1, b1), (w2, b2)):
        y = jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + b.astype(y.dtype)
        y = jnp.maximum(y, y * jnp.asarray(LEAKY_SLOPE, y.dtype))
    b_, h, wd, c = y.shape
    pooled = y.reshape(b_, h // 2, 2, wd // 2, 2, c).mean(axis=(2, 4))
    return pooled, y


@functools.partial(jax.jit, static_argnames=("nchw_in",))
def unet_stage2(x, w1, b1, w2, b2, nchw_in: bool = False):
    """Fused 2-conv U-Net encoder stage; NCHW outputs.

    Args:
      x: [B, H, W, C] stage input (bf16 or f32), or [B, C, H, W] when
        ``nchw_in`` (the layout the previous fused stage emitted).
      w1: [K, K, C, F] HWIO kernel of the first conv (K in {3, 5, 7}).
      b1: [F] bias of the first conv.
      w2: [K, K, F, F] HWIO kernel of the second conv.
      b2: [F] bias of the second conv.

    Returns:
      (pooled, act): [B, F, H/2, W/2] and [B, F, H, W], both NCHW —
      ``act = lrelu(conv2(lrelu(conv1(x))))`` (the U-Net skip) and
      ``pooled = avg_pool_2x2(act)`` (the next stage's input).
    """
    if nchw_in:
        B, C, H, W = x.shape
    else:
        B, H, W, C = x.shape
    K = w1.shape[0]
    R = (K - 1) // 2
    F = w1.shape[-1]
    dt = x.dtype
    Cp = _pad_c(C)
    TH = _pick_th(H, Cp, F, W, K)
    if C != Cp:
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    # NCHW, H zero-padded by the conv1+conv2 halo, rows flattened into lanes
    if not nchw_in:
        x = jnp.transpose(x, (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, Cp - C), (2 * R, 2 * R), (0, 0)))
    x = x.reshape(B, Cp, (H + 4 * R) * W)
    w1m = jnp.transpose(w1.astype(dt).reshape(K * K * Cp, F))  # [F, K^2 Cp]
    w2m = jnp.transpose(w2.astype(dt).reshape(K * K * F, F))   # [F, K^2 F]
    b1c = b1.reshape(F, 1).astype(jnp.float32)
    b2c = b2.reshape(F, 1).astype(jnp.float32)
    grid = (B, H // TH)
    kernel = functools.partial(_kernel, TH=TH, W=W, F=F, NH=H // TH, K=K)
    hpool, act = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((F, K * K * Cp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, K * K * F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, F, (TH // 2) * W), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, F, TH * W), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, F, (H // 2) * W), dt),
            jax.ShapeDtypeStruct((B, F, H * W), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((Cp, (TH + 4 * R) * W), dt),
            pltpu.VMEM((F, (TH + 2 * R) * W), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * K * (Cp + F) * F * H * W * B,
            bytes_accessed=B * H * W * 2 * (Cp + F + F // 4),
            transcendentals=0,
        ),
    )(x, w1m, b1c, w2m, b2c)
    # W-pair mean of the half-pooled tensor (lane compaction has no cheap
    # Mosaic form; this is a 4x-smaller tensor, one fused XLA pass)
    pooled = jnp.mean(hpool.reshape(B, F, (H // 2) * (W // 2), 2), axis=3)
    return pooled.reshape(B, F, H // 2, W // 2), act.reshape(B, F, H, W)
