#!/usr/bin/env python
"""Measure the CPU-proxy baseline used by bench.py's vs_baseline ratio.

Runs the full 4-net pipeline forward at 512x512 on the jax CPU backend and
prints images/sec.  Run once per machine; copy the number into
bench.py:CPU_BASELINE_IMG_S.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from singlehdr_tpu.models import ReverseCameraPipeline

    pipe = ReverseCameraPipeline()
    ldr = jnp.asarray(np.random.RandomState(0).rand(1, 512, 512, 3), jnp.float32)
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0), ldr)
    fwd = jax.jit(lambda v, x: pipe.apply(v, x).hdr)
    fwd(variables, ldr).block_until_ready()  # compile
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = fwd(variables, ldr)
    out.block_until_ready()
    dt = time.time() - t0
    print(f"CPU baseline: {iters / dt:.3f} images/sec ({dt / iters:.2f} s/img)")


if __name__ == "__main__":
    main()
