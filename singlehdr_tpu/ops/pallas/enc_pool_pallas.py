"""Fused VGG-encoder-stage Pallas kernel: conv3x3+ReLU x2 + 2x2 max-pool.

Why this exists (measured on v5e, b64 @ 512^2 bf16, BENCH_NOTES r3): the
Hallucination-Net encoder's first two stages are the pipeline's worst
HBM-traffic sites — XLA materializes the conv1 activation (4.3 GB at enc1)
and pads every C=64 NHWC tensor 2x in the lane dim (bf16 tiles are
sublane x 128 lanes; 64 channels fill half a tile), so the pair runs ~3x
over its memory roofline.  NCHW dimension numbers through XLA are slower
still (35 ms/conv) and the packed-lane transform only breaks even at p=2 —
reference experiments in BENCH_NOTES.  The fix controls layout and fusion
directly, and keeps everything **channels-major** so no tensor ever pads:

  * the stage input is NCHW with H zero-padded by 2 rows top and bottom
    ([B, C, Hp, W], C sublane-tile-padded), flattened to [B, C, Hp*W] so one
    grid step DMAs its (TH+4)-row slab as a single lane-contiguous slice —
    conv1+conv2 halos included, rows arriving pre-zeroed so no boundary
    clamps exist in the kernel,
  * conv1 runs for the whole block as ONE [F, 9C] x [9C, (TH+2)W] MXU
    matmul: the im2col matrix is built from three 128-aligned lane slices
    of the slab (kh taps) x three lane rotations with edge masks (kw taps)
    — the conv1 activation lives only in VMEM, never in HBM,
  * conv2 accumulates three [F, 3F] x [3F, TH*W] matmuls (one per kh tap) —
    channels-major so the MXU's N dim is the TH*W pixel axis (full) instead
    of F=64 (half-empty); a full [9F, THW] im2col would blow VMEM at useful
    block heights,
  * the 2x2/2 max-pool's H-reduction folds into the same pass (roll by W +
    max + even-row selection, all lane-tile aligned); the W-pair reduction
    — a lane-compaction Mosaic has no cheap primitive for — runs as one
    tiny XLA reshape-max on the 4x-smaller half-pooled tensor,
  * both HBM writes (skip, half-pooled) are NCHW: the pooled result chains
    into the next fused stage without a transpose, and the skip is consumed
    by the decoder's SkipFusion as a matmul operand where NCHW reads at
    full bandwidth (models/hallucination._SplitConv1x1).

Mosaic gotchas encoded here: lane rotate is 32-bit-only (bf16 rolls run on
an i32 view — adjacent sublane pairs pack into one word, lanes shift
identically); compare-produced i1 vectors can't relayout into 16x128 bf16
tiles (edge masks use arithmetic min instead); HBM slices must be
lane-tile-aligned; lane-dim reshapes ([F, THW] -> [F, TH, W]) are
relayouts, so the kernel never reshapes — row blocks are 128-aligned lane
slices.

Semantics are exactly ``max_pool(relu(conv2(relu(conv1(x)))))`` with SAME
padding and the skip being the pre-pool activation (hallucination_net.py:
43-57).  Forward-only: the hallucination encoder has no BN and training
forwards take the dense path (models/hallucination.py gates on ``train``),
so no custom VJP is needed.  Off-TPU callers use the identical-math XLA
fallback below.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM stack limit is 16M; the kernel raises it via
# CompilerParams (v5e has 128M physical VMEM) and budgets against that.
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 40 * 1024 * 1024


def _pad_c(c: int) -> int:
    return c if c % 8 == 0 else c + (8 - c % 8)


def _vmem_bytes(th: int, c: int, f: int, w: int) -> int:
    """Estimate of the kernel's peak VMEM residency at block height ``th``
    (calibrated against the compiler's scoped-vmem accounting, which counts
    each live buffer once)."""
    bf2 = 2
    slab = c * (th + 4) * w * bf2
    col1 = 9 * c * (th + 2) * w * bf2
    c1buf = f * (th + 2) * w * bf2
    acc = th * w * f * 4                       # f32 conv2 accumulator
    piece = 3 * f * th * w * bf2               # one kh tap's kw-concat
    outs = (th * w * f + (th // 2) * w * f) * bf2
    weights = (f * 9 * c + 9 * f * f) * bf2
    # transposed-skip emission (nhwc_skip): the [THW, F] f32 dot output and
    # its bf16 cast, both lane-padded to >=128 — counted unconditionally
    # (conservative for the NCHW mode; no measured geometry changes block)
    xpose = th * w * max(f, 128) * (4 + bf2)
    return slab + col1 + c1buf + acc + piece + outs + weights + xpose


def _pick_th(h: int, c: int, f: int, w: int):
    for th in (32, 16, 8):
        if h % th == 0 and _vmem_bytes(th, c, f, w) < _VMEM_BUDGET:
            return th
    return None


def supported(x_shape: Tuple[int, ...], f: int, nchw: bool = False) -> bool:
    """Static gate for stage input [B, H, W, C] (or [B, C, H, W]) and F
    output channels."""
    if len(x_shape) != 4:
        return False
    if nchw:
        b, c, h, w = x_shape
    else:
        b, h, w, c = x_shape
    if not (w % 128 == 0 and f % 8 == 0 and h % 16 == 0):
        return False
    return _pick_th(h, _pad_c(c), f, w) is not None


def _edge_masks(w, lanes, dtype):
    """(left, right) multiplicative edge masks of shape [1, lanes]: 0 where a
    lane rotation crossed a row border (w == 0 / w == W-1), else 1.

    Arithmetic (min against 1) instead of compare+select: Mosaic cannot
    relayout the i1 vectors a compare produces into the 16x128 bf16 tiling
    the masked multiply needs."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % w
    return (
        jnp.minimum(wpos, 1).astype(dtype),
        jnp.minimum(w - 1 - wpos, 1).astype(dtype),
    )


def _roll1(x, shift):
    """Lane rotation by a static shift.  Mosaic's rotate is 32-bit-only, so
    bf16 data rotates as an i32 view (adjacent sublane pairs pack into one
    word; lanes shift identically) — no f32 round-trip, half the vregs."""
    lanes = x.shape[-1]
    if x.dtype == jnp.bfloat16 and x.shape[0] % 2 == 0:
        v = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(v, shift % lanes, 1), jnp.bfloat16)
    return pltpu.roll(x.astype(jnp.float32), shift % lanes, 1).astype(x.dtype)


def _rolled_taps(piece, masks):
    """kw in (-1, 0, +1) tap views of a [C, R*W] block, zeroed at row edges.

    Rolls cross the merged row boundaries; the masks kill exactly those lanes
    (w == 0 for the left tap, w == W-1 for the right), which matches SAME
    zero-padding.
    """
    ml, mr = masks
    lanes = piece.shape[-1]
    left = _roll1(piece, 1) * ml[:, :lanes]
    right = _roll1(piece, -1) * mr[:, :lanes]
    return left, piece, right


def _kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, hpool_ref, skip_ref, slab, c1buf,
    sem, *, TH, W, F, NH, NHWC_SKIP,
):
    i_b = pl.program_id(0)
    i_h = pl.program_id(1)
    r1 = TH + 2                                # conv1 rows computed
    masks = _edge_masks(W, r1 * W, slab.dtype)

    cp = pltpu.make_async_copy(
        x_hbm.at[i_b, :, pl.ds(i_h * TH * W, (TH + 4) * W)], slab, sem
    )
    cp.start()
    cp.wait()

    # conv1: one [F, 9C] x [9C, r1*W] matmul over the whole block
    parts = []
    for dh in range(3):                        # kh-major, kw, C blocks
        piece = slab[:, pl.ds(dh * W, r1 * W)]
        parts.extend(_rolled_taps(piece, masks))
    col1 = jnp.concatenate(parts, axis=0)      # [9C, r1*W]
    out1 = jax.lax.dot_general(
        w1_ref[:], col1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [F, r1*W]
    out1 = jnp.maximum(out1 + b1_ref[:].astype(jnp.float32), 0.0)
    c1buf[:] = out1.astype(c1buf.dtype)

    # rows beyond the image top/bottom must be zero for conv2's SAME pad
    # (the zero-padded input makes them relu(bias) instead)
    @pl.when(i_h == 0)
    def _():
        c1buf[:, pl.ds(0, W)] = jnp.zeros((F, W), c1buf.dtype)

    @pl.when(i_h == NH - 1)
    def _():
        c1buf[:, pl.ds((r1 - 1) * W, W)] = jnp.zeros((F, W), c1buf.dtype)

    # conv2, channels-major: out2[F, THW] = sum_dh w2tap[F, 3F] @ col[3F, THW]
    out2 = jnp.zeros((F, TH * W), jnp.float32)
    for dh in range(3):
        piece = c1buf[:, pl.ds(dh * W, TH * W)]
        col = jnp.concatenate(_rolled_taps(piece, masks), axis=0)  # [3F, THW]
        out2 = out2 + jax.lax.dot_general(
            w2_ref[:, pl.ds(dh * 3 * F, 3 * F)], col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out2 = jnp.maximum(out2 + b2_ref[:].astype(jnp.float32), 0.0)
    act = out2.astype(skip_ref.dtype)          # [F, THW]
    if NHWC_SKIP:
        # Emit the skip already pixels-major ([THW, F]) via an MXU
        # identity-matmul transpose (ROADMAP #10(a)): the NCHW original then
        # never exists in HBM, so the decoder consumes the skip directly with
        # no boundary copy and no second-layout twin — the arena cost that
        # kept the fused chain from compiling at b128 (BENCH_NOTES r4).
        # dot_general contracting act's F dim against I_F yields act^T; each
        # output element is one exact x*1 product, so bf16 is bit-exact.
        r = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
        eye = (1 - jnp.minimum(jnp.abs(r - c), 1)).astype(act.dtype)
        # HIGHEST precision for f32 only: under the default, an f32 act is
        # rounded to ONE bf16 pass (measured 3.9e-3 skip error).  bf16 act is
        # exact either way (each output is a single x*1 product) — and Mosaic
        # REJECTS a multi-pass precision request on bf16 operands ("Bad lhs
        # type" for the fp32-contract tpu.matmul, probed 2026-08-20), so the
        # request must be dtype-conditional.
        prec = (
            jax.lax.Precision.HIGHEST if act.dtype == jnp.float32 else None
        )
        skip_ref[0] = jax.lax.dot_general(
            act, eye,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(skip_ref.dtype)               # [THW, F]
    else:
        skip_ref[0] = act

    # H-pool: roll row h+1 onto row h, max, keep even rows — every slice is a
    # 128-aligned lane-tile slice (W % 128 == 0), so no relayouts
    hm = jnp.maximum(act, _roll1(act, -W))
    rows = [hm[:, 2 * t * W:(2 * t + 1) * W] for t in range(TH // 2)]
    hpool_ref[0] = jnp.concatenate(rows, axis=1)  # [F, (TH/2)W]


def _xla_reference(x_nhwc, w1, b1, w2, b2):
    """Identical-math XLA path (and test oracle): NHWC in, NHWC out."""
    y = x_nhwc
    for w, b in ((w1, b1), (w2, b2)):
        y = jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y + b.astype(y.dtype))
    pooled = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )
    return pooled, y


@functools.partial(jax.jit, static_argnames=("nchw_in", "nhwc_skip"))
def encoder_stage2(x, w1, b1, w2, b2, nchw_in: bool = False,
                   nhwc_skip: bool = False):
    """Fused 2-conv VGG encoder stage; NCHW pooled output.

    Args:
      x: [B, H, W, C] stage input (bf16 or f32), or [B, C, H, W] when
        ``nchw_in`` (the layout the previous fused stage emitted).
      w1: [3, 3, C, F] HWIO kernel of the first conv.
      b1: [F] bias of the first conv.
      w2: [3, 3, F, F] HWIO kernel of the second conv.
      b2: [F] bias of the second conv.
      nhwc_skip: emit the skip as [B, H, W, F] (transposed in-kernel on the
        MXU) instead of NCHW — the decoder then consumes it directly with no
        boundary copy and no NCHW twin ever existing in HBM.

    Returns:
      (pooled, skip): [B, F, H/2, W/2] NCHW and the pre-pool activation
      [B, F, H, W] (or [B, H, W, F] under ``nhwc_skip``) —
      ``pooled = maxpool2x2(skip)``, ``skip = relu(conv2(relu(conv1(x))))``.
    """
    if nchw_in:
        B, C, H, W = x.shape
    else:
        B, H, W, C = x.shape
    F = w1.shape[-1]
    dt = x.dtype
    Cp = _pad_c(C)
    TH = _pick_th(H, Cp, F, W)
    if C != Cp:
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    # NCHW, H zero-padded by the conv1+conv2 halo, rows flattened into lanes
    if not nchw_in:
        x = jnp.transpose(x, (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, Cp - C), (2, 2), (0, 0)))
    x = x.reshape(B, Cp, (H + 4) * W)
    w1m = jnp.transpose(w1.astype(dt).reshape(9 * Cp, F))  # [F, 9Cp]
    w2m = jnp.transpose(w2.astype(dt).reshape(9 * F, F))   # [F, 9F]
    b1c = b1.reshape(F, 1).astype(jnp.float32)
    b2c = b2.reshape(F, 1).astype(jnp.float32)
    grid = (B, H // TH)
    kernel = functools.partial(
        _kernel, TH=TH, W=W, F=F, NH=H // TH, NHWC_SKIP=nhwc_skip
    )
    if nhwc_skip:
        skip_spec = pl.BlockSpec(
            (1, TH * W, F), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        skip_shape = jax.ShapeDtypeStruct((B, H * W, F), dt)
    else:
        skip_spec = pl.BlockSpec(
            (1, F, TH * W), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        skip_shape = jax.ShapeDtypeStruct((B, F, H * W), dt)
    hpool, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((F, 9 * Cp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 9 * F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, F, (TH // 2) * W), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            skip_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, F, (H // 2) * W), dt),
            skip_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((Cp, (TH + 4) * W), dt),
            pltpu.VMEM((F, (TH + 2) * W), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * (Cp + F) * F * H * W * B,
            bytes_accessed=B * H * W * 2 * (Cp + F + F // 4),
            transcendentals=0,
        ),
    )(x, w1m, b1c, w2m, b2c)
    # W-pair reduction of the half-pooled tensor (lane compaction has no
    # cheap Mosaic form; this is a 4x-smaller tensor, one fused XLA pass)
    pooled = jnp.max(hpool.reshape(B, F, (H // 2) * (W // 2), 2), axis=3)
    skip = (
        skip.reshape(B, H, W, F) if nhwc_skip else skip.reshape(B, F, H, W)
    )
    return pooled.reshape(B, F, H // 2, W // 2), skip
