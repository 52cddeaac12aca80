"""Pallas strip-conv: full-MXU convolution for small output-channel counts.

The U-Net stages with C_out in {3, 16, 32} run at ~6 TFLOP/s under XLA because
a conv's output channels map to the MXU's 128 result rows — C_out=16 fills
12.5% of them (BENCH_NOTES.md).  This kernel batches R = 128 // C_out output
ROWS of the image into one matmul so all 128 rows are live:

  out[i*C + c, x] = sum_{ci,ry,dx} Ws[i*C + c, (ci,ry,dx)] * Xcol[(ci,ry,dx), x]

where Xcol packs an (R + kh - 1)-row input strip with kw lane shifts and Ws is
the block-Toeplitz expansion of the kernel (zero where ry - i is outside the
tap range).  The zero padding wastes kh/(R+kh-1) of the MACs but the MXU runs
full, netting ~2-4x over XLA for these shapes.

Scope: stride 1, SAME padding, fused bias + activation; forward only (the
inference fast path — training keeps XLA convs).  The wrapper materializes
overlapping row strips with plain XLA ops, so the kernel needs no manual DMA
and every block is a clean non-overlapping BlockSpec.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MXU_ROWS = 128


def _act(name: Optional[str], x):
    if name is None:
        return x
    if name == "leaky_relu":
        return jax.nn.leaky_relu(x, 0.1)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    raise ValueError(name)


def strip_conv_supported(x_shape, cout: int) -> bool:
    """Static check: strip rows must divide H (and Cout fit the MXU)."""
    cout_p = 1
    while cout_p < cout:
        cout_p *= 2
    if cout_p > MXU_ROWS:
        return False
    rows = MXU_ROWS // cout_p
    return x_shape[1] % rows == 0


def build_strip_weights(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    """[kh,kw,Cin,Cout] -> block-Toeplitz [rows*Cout, Cin*(rows+kh-1)*kw].

    Column order (ci, ry, dx) matches the kernel's Xcol packing.
    """
    kh, kw, cin, cout = w.shape
    span = rows + kh - 1
    # ws[i, c, ci, ry, dx] = w[ry - i, dx, ci, c] when 0 <= ry - i < kh
    i_idx = jnp.arange(rows)[:, None, None, None, None]
    ry_idx = jnp.arange(span)[None, None, None, :, None]
    tap = ry_idx - i_idx                                    # [rows,1,1,span,1]
    w_t = jnp.transpose(w, (2, 0, 1, 3))                    # [cin, kh, kw, cout]
    tap_c = jnp.clip(tap, 0, kh - 1)
    gathered = w_t[:, tap_c[:, 0, 0, :, 0]]                 # [cin, rows, span, kw, cout]
    valid = ((tap >= 0) & (tap < kh))[:, 0, 0, :, 0]        # [rows, span]
    gathered = gathered * valid[None, :, :, None, None]
    # -> [rows, cout, cin, span, kw]
    ws = jnp.transpose(gathered, (1, 4, 0, 2, 3))
    return ws.reshape(rows * cout, cin * span * kw)


def _kernel(strip_ref, ws_ref, bias_ref, out_ref, xcol_ref, *, cin, span, kw, w_out, act):
    # strip_ref: [1, cin, span, w_pad]; xcol_ref scratch: [K, w_out]
    # (stores handle the per-slice lane offsets; Mosaic cannot concat them)
    j = 0
    for ci in range(cin):
        for ry in range(span):
            for dx in range(kw):
                xcol_ref[j : j + 1, :] = strip_ref[0, ci, ry : ry + 1, dx : dx + w_out]
                j += 1
    out = jax.lax.dot_general(
        ws_ref[...],                                        # [128, K]
        xcol_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [128, w_out]
    out_ref[0] = _act(act, out + bias_ref[...])


def strip_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME stride-1 conv via row-strip matmuls.

    Args:
      x: [B, H, W, Cin] (NHWC, like flax convs).
      w: [kh, kw, Cin, Cout] with Cout dividing 128 and (128//Cout) dividing H.
      b: [Cout] bias.
      act: None | 'relu' | 'leaky_relu' | 'tanh' fused activation.

    Returns: [B, H, W, Cout] float32.
    """
    bsz, h, w_in, cin = x.shape
    kh, kw, wcin, cout = w.shape
    if wcin != cin:
        raise ValueError(f"Cin mismatch: x has {cin}, w has {wcin}")
    if not strip_conv_supported(x.shape, cout):
        raise ValueError(f"strip_conv unsupported for {x.shape} -> {cout}")
    # pad Cout up to the next power-of-two divisor of 128 (e.g. head's 3 -> 4)
    cout_p = 1
    while cout_p < cout:
        cout_p *= 2
    if cout_p > MXU_ROWS:
        raise ValueError(f"Cout={cout} too large for strip conv")
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        b = jnp.pad(b, (0, cout_p - cout))
    rows = MXU_ROWS // cout_p
    if h % rows:
        raise ValueError(f"H={h} not divisible by strip rows={rows}")
    span = rows + kh - 1
    ph, pw = kh // 2, kw // 2
    w_out = -(-w_in // 128) * 128                           # lane-aligned output
    # slices reach dx + w_out, dx < kw — pad width to cover them
    w_pad_to = -(-(w_out + kw - 1) // 128) * 128

    dtype = x.dtype  # keep HBM traffic in the caller's dtype (e.g. bf16)
    # NHWC -> NCHW with SAME padding, W padded to a lane multiple
    xt = jnp.transpose(x, (0, 3, 1, 2))
    xt = jnp.pad(
        xt, ((0, 0), (0, 0), (ph, ph), (pw, pw + w_pad_to - w_in - kw + 1))
    )
    n_strips = h // rows
    # overlapping strips materialized by XLA (cheap HBM copies)
    strips = jnp.stack(
        [xt[:, :, i * rows : i * rows + span, :] for i in range(n_strips)], axis=1
    ).reshape(bsz * n_strips, cin, span, w_pad_to)

    ws = build_strip_weights(w, rows).astype(dtype)         # [128, K]
    k = ws.shape[1]
    bias = jnp.tile(b.astype(jnp.float32), rows)[:, None]   # [128, 1]

    out = pl.pallas_call(
        functools.partial(
            _kernel, cin=cin, span=span, kw=kw, w_out=w_out, act=act
        ),
        grid=(bsz * n_strips,),
        in_specs=[
            pl.BlockSpec(
                (1, cin, span, w_pad_to), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((MXU_ROWS, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MXU_ROWS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, MXU_ROWS, w_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * n_strips, MXU_ROWS, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, w_out), dtype)],
        interpret=interpret,
    )(strips, ws, bias)

    # [B*n_strips, rows*Cout_p, w_out] -> [B, H, W, Cout], in the caller's
    # dtype so downstream stages keep their bf16 HBM footprint
    out = out[:, :, :w_in].reshape(bsz, n_strips, rows, cout_p, w_in)
    out = jnp.transpose(out, (0, 1, 2, 4, 3)).reshape(bsz, h, w_in, cout_p)
    return out[..., :cout].astype(dtype)
