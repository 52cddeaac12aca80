#!/usr/bin/env python
"""Microbenchmark: decoder upsample+conv vs conv-to-4xC + depth-to-space.

The hal/U-Net decoders compute conv3x3(bilinear_x2(x)) — the conv runs at 2x
resolution and the upsampled tensor round-trips HBM.  The same math (interior
pixels; borders need correction terms) is one conv at LOW resolution emitting
4x output channels (one per output phase, composite lerp⊛K kernels) followed
by depth-to-space.  Same FLOPs, better lane fill for small Cout, no 4x
materialized intermediate.  This measures whether the rewrite is worth exact
border handling, per decoder stage shape.

    python tools/exp_d2s.py --batch 64
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from singlehdr_tpu.ops.resize import resize_bilinear_x2


def timeit(fn, *args, iters=8):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000


def baseline(x, k):
    up = resize_bilinear_x2(x)
    return lax.conv_general_dilated(
        up, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def composite_kernel(k):
    """[3,3,Cin,Cout] -> [3,3,Cin,4*Cout] phase kernels (interior math)."""
    t0 = np.zeros((3, 3), np.float32)  # phase-0 axis transform
    t1 = np.zeros((3, 3), np.float32)
    # rows: composite tap (-1,0,1); cols: original tap (-1,0,1)
    t0[0] = [0.75, 0.25, 0.0]
    t0[1] = [0.25, 0.75, 0.75]
    t0[2] = [0.0, 0.0, 0.25]
    t1[0] = [0.25, 0.0, 0.0]
    t1[1] = [0.75, 0.75, 0.25]
    t1[2] = [0.0, 0.25, 0.75]
    ks = []
    for th in (t0, t1):
        for tw in (t0, t1):
            kk = jnp.einsum("ab,cd,bdio->acio", th, tw, k)
            ks.append(kk)
    return jnp.concatenate(ks, axis=-1)  # [3,3,Cin,4Cout]


def d2s(x, cout):
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, cout)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, cout)


def fused(x, k4, cout):
    y = lax.conv_general_dilated(
        x, k4, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return d2s(y, cout)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    print("devices:", jax.devices(), flush=True)
    # hal decoder stages at 512^2 input: (low-res size, Cin, Cout)
    shapes = [(16, 512, 512), (32, 512, 512), (64, 512, 256),
              (128, 256, 128), (256, 128, 64)]
    for s, cin, cout in shapes:
        x = jnp.asarray(rng.rand(args.batch, s, s, cin), dt)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        k4 = composite_kernel(k.astype(jnp.float32)).astype(dt)
        f_base = jax.jit(lambda x, k: baseline(x, k))
        f_fuse = jax.jit(lambda x, k4: fused(x, k4, cout))
        ms_b = timeit(f_base, x, k)
        ms_f = timeit(f_fuse, x, k4)
        # interior parity check (borders intentionally differ)
        yb = np.asarray(f_base(x, k)[0, 4:-4, 4:-4, :3], np.float32)
        yf = np.asarray(f_fuse(x, k4)[0, 4:-4, 4:-4, :3], np.float32)
        err = np.abs(yb - yf).max() / max(np.abs(yb).max(), 1e-6)
        print(
            f"{s:4d}^2 {cin:4d}->{cout:4d}: resize+conv {ms_b:7.2f} ms | "
            f"conv4x+d2s {ms_f:7.2f} ms  ({ms_b / ms_f:4.2f}x)  interior rel "
            f"err {err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
