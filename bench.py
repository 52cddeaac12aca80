#!/usr/bin/env python
"""Headline benchmark: HDR-Real 512x512 images/sec/chip, full 4-net pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference stack's throughput proxy: the
same 4-net pipeline executed on the host CPU (the reference's TF2 code path
publishes no numbers — SURVEY.md §6 — and its GPU is absent here; the
BASELINE.json north star is stated vs TF2-CPU).  The CPU proxy was measured
once on this machine with this framework's own CPU backend (see
CPU_BASELINE_IMG_S below) to avoid re-burning bench time every round.

Everything non-headline goes to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Measured 2026-08-16 on this host: full 4-net pipeline forward, 512x512,
# batch 1, jax CPU backend (see tools/measure_cpu_baseline.py).
CPU_BASELINE_IMG_S = 0.174

BATCH = 64     # best measured throughput config on v5e (96+ OOMs at compile)
SIZE = 512
WARMUP = 2
ITERS = 8
# bfloat16 compute (f32 params/LUT math): deviates from the f32 pipeline by
# ~64 dB PSNR at 512^2 — negligible against the 0.1 dB parity budget.
DTYPE = "bfloat16"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from singlehdr_tpu.models import ReverseCameraPipeline

    log("devices:", jax.devices())
    pipe = ReverseCameraPipeline(dtype=jnp.dtype(DTYPE))
    ldr = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32
    )
    t0 = time.time()
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0), ldr[:1])
    jax.block_until_ready(variables)
    log(f"init: {time.time() - t0:.1f}s")

    fwd = jax.jit(lambda v, x: pipe.apply(v, x).hdr)
    t0 = time.time()
    out = fwd(variables, ldr)
    out.block_until_ready()
    log(f"compile+first: {time.time() - t0:.1f}s")

    for _ in range(WARMUP):
        fwd(variables, ldr).block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        out = fwd(variables, ldr)
    out.block_until_ready()
    dt = time.time() - t0
    img_s = BATCH * ITERS / dt
    log(f"{img_s:.2f} img/s  ({dt / ITERS * 1000:.1f} ms/batch of {BATCH})")

    print(
        json.dumps(
            {
                "metric": "HDR-Real 512x512 images/sec/chip (full 4-net pipeline)",
                "value": round(img_s, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / CPU_BASELINE_IMG_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
