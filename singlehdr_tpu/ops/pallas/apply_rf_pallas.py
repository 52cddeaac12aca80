"""Pallas TPU kernel for per-sample 1-D LUT application (apply_rf).

XLA lowers the reference semantics (take_along_axis over a per-sample
[b, 1024] curve, tf_utils.py:95-105) to a dynamic-gather that dominates the
whole 4-net pipeline on TPU (~109 ms of a 264 ms batch at 8x512x512).  TPUs
have no fast per-lane gather; the native formulation is gather-as-matmul.

Two-level decomposition: with K = HI*LO (1024 = 32*32), index i = hi*LO + lo.
For a block of pixels:

  1. row-select on the MXU:  R = rf_t @ onehot_hi, where rf_t[l, h] =
     rf[h*LO + l] is the LUT laid out [LO, HI] (pre-transposed on the host
     side of the call), onehot_hi[h, p] = [h == hi_p]  ->  R[l, p] =
     rf[hi_p*LO + l].
  2. lane-select on the VPU:  v[p] = sum_l R[l, p] * [l == lo_p].

This costs ~4*LO + HI VPU ops per pixel instead of the naive 2*K of a full
one-hot (16x less for K=1024), plus two small [LO,HI]x[HI,BLOCK] matmuls.
Both gathers (floor and ceil index) run this way and are lerped with the
fractional part.  Matmuls run at Precision.HIGHEST — the MXU's default bf16
passes would round curve values to ~4e-3, visible as banding after the
inverse CRF.

All intermediates keep pixels on the lane axis — no lane<->sublane
transposes.  The batch pads to the 8-sublane tile and grids as
(batch_group, pixel_block); the kernel unrolls the 8 samples of a group.

Semantics match ops.curves.apply_rf exactly, including the clamp of the
unclamped floor+1 for out-of-range inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512    # pixels per grid step (lane-axis extent)
GROUP = 8      # samples per grid step (sublane tile)
LO = 32        # lane-select factor;  K = LO * HI
_HIGHEST = jax.lax.Precision.HIGHEST


def _gather_matmul(rf_t, hi, lo, rows_hi, rows_lo):
    """rf[hi*LO + lo] for one pixel row: [LO,HI] x onehots -> [1, BLOCK]."""
    onehot_hi = (rows_hi == hi).astype(jnp.float32)            # [HI, BLOCK]
    r = jax.lax.dot_general(
        rf_t,
        onehot_hi,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGHEST,
    )                                                          # [LO, BLOCK]
    sel = jnp.where(rows_lo == lo, r, 0.0)                     # [LO, BLOCK]
    return jnp.sum(sel, axis=0, keepdims=True)                 # [1, BLOCK]


def _kernel(x_ref, rf_t_ref, o_ref, *, k: int):
    hi_n = k // LO
    rows_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, BLOCK), 0)
    rows_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, BLOCK), 0)
    for s in range(GROUP):
        x = x_ref[s : s + 1, :]                                # [1, BLOCK]
        rf_t = rf_t_ref[s]                                     # [LO, HI]
        y = x * (k - 1.0)
        y0 = jnp.floor(y)
        frac = y - y0
        i0 = jnp.clip(y0.astype(jnp.int32), 0, k - 1)
        i1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, k - 1)
        v0 = _gather_matmul(rf_t, i0 // LO, i0 % LO, rows_hi, rows_lo)
        v1 = _gather_matmul(rf_t, i1 // LO, i1 % LO, rows_hi, rows_lo)
        o_ref[s : s + 1, :] = v0 + frac * (v1 - v0)


def _bwd_kernel(x_ref, rf_t_ref, g_ref, gx_ref, grf_t_ref, *, k: int):
    """Backward: gx = (k-1)*(v1-v0)*g;  grf = scatter of lerp weights.

    The scatter is two one-hot contractions per index set:
        grf2d[l, h] += sum_p [l == lo_p] * (w_p * g_p) * [h == hi_p]
    i.e.  (onehot_lo * wg) [LO,BLOCK]  x  onehot_hi [HI,BLOCK]^T  on the MXU.
    The [GROUP, LO, HI] output block is revisited for every pixel block of a
    batch group (grid iterates the pixel dim innermost), so it is zeroed at
    the first pixel block and accumulated afterwards.
    """
    hi_n = k // LO
    rows_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, BLOCK), 0)
    rows_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, BLOCK), 0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        grf_t_ref[...] = jnp.zeros_like(grf_t_ref)

    for s in range(GROUP):
        x = x_ref[s : s + 1, :]
        g = g_ref[s : s + 1, :]
        rf_t = rf_t_ref[s]
        y = x * (k - 1.0)
        y0 = jnp.floor(y)
        frac = y - y0
        i0 = jnp.clip(y0.astype(jnp.int32), 0, k - 1)
        i1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, k - 1)
        hi0, lo0 = i0 // LO, i0 % LO
        hi1, lo1 = i1 // LO, i1 % LO
        v0 = _gather_matmul(rf_t, hi0, lo0, rows_hi, rows_lo)
        v1 = _gather_matmul(rf_t, hi1, lo1, rows_hi, rows_lo)
        gx_ref[s : s + 1, :] = (k - 1.0) * (v1 - v0) * g

        def scatter(hi, lo, wg):
            a = jnp.where(rows_lo == lo, wg, 0.0)              # [LO, BLOCK]
            oh = (rows_hi == hi).astype(jnp.float32)           # [HI, BLOCK]
            return jax.lax.dot_general(
                a,
                oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HIGHEST,
            )                                                   # [LO, HI]

        grf_t_ref[s] += scatter(hi0, lo0, (1.0 - frac) * g) + scatter(
            hi1, lo1, frac * g
        )


def _pad_args(x, rf, k):
    b = rf.shape[0]
    flat = x.reshape(b, -1).astype(jnp.float32)
    n = flat.shape[1]
    n_pad = (-n) % BLOCK
    b_pad = (-b) % GROUP
    if n_pad:
        flat = jnp.pad(flat, ((0, 0), (0, n_pad)))
    # [b, K] -> [b, LO, HI] with rf_t[b, l, h] = rf[b, h*LO + l]
    rf_t = rf.astype(jnp.float32).reshape(b, k // LO, LO).transpose(0, 2, 1)
    if b_pad:
        flat = jnp.pad(flat, ((0, b_pad), (0, 0)))
        rf_t = jnp.pad(rf_t, ((0, b_pad), (0, 0), (0, 0)))
    return flat, rf_t, n, n_pad, b_pad


def _pixel_spec():
    return pl.BlockSpec((GROUP, BLOCK), lambda i, j: (i, j), memory_space=pltpu.VMEM)


def _curve_spec(k):
    return pl.BlockSpec(
        (GROUP, LO, k // LO), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )


@jax.custom_vjp
def _apply_rf_core(x: jnp.ndarray, rf: jnp.ndarray) -> jnp.ndarray:
    b, k = rf.shape
    shape = x.shape
    flat, rf_t, n, n_pad, b_pad = _pad_args(x, rf, k)
    grid = (flat.shape[0] // GROUP, flat.shape[1] // BLOCK)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[_pixel_spec(), _curve_spec(k)],
        out_specs=_pixel_spec(),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
    )(flat, rf_t)
    if b_pad:
        out = out[:b]
    if n_pad:
        out = out[:, :n]
    return out.reshape(shape)


def _core_fwd(x, rf):
    return _apply_rf_core(x, rf), (x, rf)


def _core_bwd(res, g):
    x, rf = res
    b, k = rf.shape
    shape = x.shape
    flat, rf_t, n, n_pad, b_pad = _pad_args(x, rf, k)
    gflat = g.reshape(b, -1).astype(jnp.float32)
    if n_pad:
        gflat = jnp.pad(gflat, ((0, 0), (0, n_pad)))
    if b_pad:
        gflat = jnp.pad(gflat, ((0, b_pad), (0, 0)))
    grid = (flat.shape[0] // GROUP, flat.shape[1] // BLOCK)
    gx, grf_t = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=grid,
        in_specs=[_pixel_spec(), _curve_spec(k), _pixel_spec()],
        out_specs=[_pixel_spec(), _curve_spec(k)],
        out_shape=[
            jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            jax.ShapeDtypeStruct(rf_t.shape, jnp.float32),
        ],
    )(flat, rf_t, gflat)
    if b_pad:
        gx = gx[:b]
        grf_t = grf_t[:b]
    if n_pad:
        gx = gx[:, :n]
    # [b, LO, HI] -> [b, K]
    grf = grf_t.transpose(0, 2, 1).reshape(b, k)
    return gx.reshape(shape).astype(x.dtype), grf.astype(rf.dtype)


_apply_rf_core.defvjp(_core_fwd, _core_bwd)


def apply_rf_pallas(x: jnp.ndarray, rf: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in, differentiable Pallas implementation of ops.curves.apply_rf.

    Args:
      x:  [b, ...] values (any spatial shape).
      rf: [b, k] per-sample curves; k must be divisible by 32 (1024 is).
      interpret: run under the Pallas interpreter (CPU debugging; forward only).
    """
    b, k = rf.shape
    if x.shape[0] != b:
        raise ValueError(
            f"apply_rf: batch mismatch — x has batch {x.shape[0]}, rf has {b}"
        )
    if k % LO:
        raise ValueError(f"curve length {k} not divisible by {LO}")
    if interpret:
        flat, rf_t, n, n_pad, b_pad = _pad_args(x, rf, k)
        grid = (flat.shape[0] // GROUP, flat.shape[1] // BLOCK)
        out = pl.pallas_call(
            functools.partial(_kernel, k=k),
            grid=grid,
            in_specs=[_pixel_spec(), _curve_spec(k)],
            out_specs=_pixel_spec(),
            out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            interpret=True,
        )(flat, rf_t)
        if b_pad:
            out = out[:b]
        if n_pad:
            out = out[:, :n]
        return out.reshape(x.shape)
    return _apply_rf_core(x, rf)
