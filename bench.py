#!/usr/bin/env python
"""Headline benchmark: HDR-Real 512x512 images/sec/chip, full 4-net pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference stack's throughput proxy: the
same workload executed on the host CPU (the reference's TF2 code path
publishes no numbers — SURVEY.md §6 — and its GPU is absent here; the
BASELINE.json north star is stated vs TF2-CPU).  The CPU proxies were measured
once on this machine with this framework's own CPU backend (see
tools/measure_cpu_baseline.py) to avoid re-burning bench time every round.

Modes:
  (default)   inference forward, batch 120 @ 512^2 — the headline number
  --train     joint deq+lin+hal train step, reference config batch 16 @ 256^2
              with full losses incl. VGG perceptual (joint_training.py:20-22);
              covers the north star's "≥5x TF2-CPU on joint training" clause.
              Reports MFU (XLA-counted FLOPs / step time / chip peak) to
              stderr.

Everything non-headline goes to stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Measured 2026-08-16 on this host (tools/measure_cpu_baseline.py):
# forward: full 4-net pipeline, 512x512, batch 1, jax CPU backend.
CPU_BASELINE_IMG_S = 0.174
# joint train: deq+lin+hal step, batch 16 @ 256^2, full losses, jax CPU
# (153.9 s/step measured 2026-08-16).
CPU_BASELINE_TRAIN_IMG_S = 0.104

# Best measured throughput config on v5e.  Large batches became compilable
# once the round-2 memory work landed (fused upsample-convs + NCHW feature
# stack); r2: b64: 90.8 img/s, b96: 121.3, b112: 130.7, b120: 131.6, b128:
# OOM.  The round-3 fused hal encoder chain raised peak HBM ~1 GB at b120
# (16.7 vs 15.75 G) but cut hal latency ~35%; b112 is the new best fit.
BATCH = 112
SIZE = 512
WARMUP = 2
ITERS = 8
# bfloat16 compute (f32 params/LUT math): deviates from the f32 pipeline by
# ~64 dB PSNR at 512^2 — negligible against the 0.1 dB parity budget.
DTYPE = "bfloat16"

TRAIN_BATCH = 16   # reference joint config (joint_training.py:20-22)
TRAIN_SIZE = 256
TRAIN_ITERS = 10
# v5e (TPU v5 lite) peak dense bf16 matmul throughput, per chip.
PEAK_BF16_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _is_oom(e: Exception) -> bool:
    """Only HBM exhaustion justifies the smaller-batch fallback; any other
    failure (tracing bug, shape error) must surface, not silently demote the
    headline to a smaller-batch number (ADVICE r2).  Under the axon tunnel
    the AOT compile helper reports HBM exhaustion as an INTERNAL
    remote_compile HTTP 500 (the 'Ran out of memory in memory space hbm'
    detail stays in the terminal log), so that signature is treated as OOM
    too: client-side tracing/shape bugs raise before remote compile is ever
    reached."""
    s = str(e)
    return (
        "RESOURCE_EXHAUSTED" in s
        or "Out of memory" in s
        or "Ran out of memory" in s
        or ("remote_compile" in s and "tpu_compile_helper" in s)
    )


def _emit(metric, img_s, baseline, extra=None):
    rec = {
        "metric": metric,
        "value": round(img_s, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / baseline, 2),
    }
    rec.update(extra or {})
    print(json.dumps(rec))


def bench_forward(emit=True):
    from singlehdr_tpu.models import ReverseCameraPipeline

    log("devices:", jax.devices())
    pipe = ReverseCameraPipeline(dtype=jnp.dtype(DTYPE))
    batch = BATCH
    rng = np.random.RandomState(0)

    def build(batch):
        ldr = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.float32)
        t0 = time.time()
        variables = jax.jit(pipe.init)(jax.random.PRNGKey(0), ldr[:1])
        jax.block_until_ready(variables)
        log(f"init: {time.time() - t0:.1f}s")
        fwd = jax.jit(lambda v, x: pipe.apply(v, x).hdr)
        t0 = time.time()
        out = fwd(variables, ldr)
        out.block_until_ready()
        log(f"compile+first: {time.time() - t0:.1f}s")
        return fwd, variables, ldr

    ladder = sorted({b for b in (batch, 112, 96, 64) if b <= batch}, reverse=True)
    for i, batch in enumerate(ladder):
        try:
            fwd, variables, ldr = build(batch)
            break
        except Exception as e:  # HBM OOM only; anything else surfaces
            if not _is_oom(e) or i == len(ladder) - 1:
                raise
            log(f"batch {batch} OOM; retrying at {ladder[i + 1]}")

    for _ in range(WARMUP):
        fwd(variables, ldr).block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        out = fwd(variables, ldr)
    out.block_until_ready()
    dt = time.time() - t0
    img_s = batch * ITERS / dt
    log(f"{img_s:.2f} img/s  ({dt / ITERS * 1000:.1f} ms/batch of {batch})")
    if emit:
        _emit(
            "HDR-Real 512x512 images/sec/chip (full 4-net pipeline)",
            img_s,
            CPU_BASELINE_IMG_S,
            {"batch": batch},
        )
    return img_s, batch


def bench_train(emit=True):
    from singlehdr_tpu.models import (
        DequantizationNet,
        HallucinationNet,
        LinearizationNet,
        Vgg16Features,
    )
    from singlehdr_tpu.train.state import init_multi_state
    from singlehdr_tpu.train.steps import make_joint_train_step

    log("devices:", jax.devices())
    b, s = TRAIN_BATCH, TRAIN_SIZE
    rng = np.random.RandomState(0)
    ldr = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    args = (
        ldr,
        jnp.clip(ldr + 0.02, 0, 1),                                # jpeg
        jnp.asarray(rng.rand(b, s, s, 3), jnp.float32),            # clipped_hdr_t
        jnp.asarray(rng.rand(b, s, s, 3), jnp.float32) * 2.0,      # hdr_t
        jnp.ones((b, 1, 1, 1), jnp.float32),                       # mask
        jnp.tile(jnp.linspace(0, 1, 1024, dtype=jnp.float32), (b, 1)),
    )
    modules = {
        "deq": DequantizationNet(dtype=jnp.dtype(DTYPE)),
        "lin": LinearizationNet(dtype=jnp.dtype(DTYPE)),
        "hal": HallucinationNet(dtype=jnp.dtype(DTYPE)),
    }
    samples = {"deq": ldr, "lin": ldr, "hal": ldr}
    t0 = time.time()
    state = init_multi_state(modules, samples, jax.random.PRNGKey(0), 1e-5)
    jax.block_until_ready(state.params)
    log(f"init: {time.time() - t0:.1f}s")
    step = make_joint_train_step(Vgg16Features(), dtype=jnp.dtype(DTYPE))

    flops = None
    try:
        lowered = step.lower(state, *args)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
        byt = float(cost.get("bytes accessed", 0.0))
        if flops and byt:
            # HBM-roofline floor: how much of the step is irreducible memory
            # traffic at v5e's ~819 GB/s (the MFU written-analysis evidence,
            # VERDICT r2 item 2)
            log(
                f"bytes accessed/step: {byt / 1e9:.1f} GB  "
                f"AI: {flops / byt:.0f} flop/B  "
                f"HBM floor: {byt / 819e9 * 1e3:.1f} ms  "
                f"MXU floor: {flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3:.1f} ms"
            )
    except Exception as e:  # cost analysis is best-effort across backends
        log(f"cost_analysis unavailable: {e}")

    t0 = time.time()
    state, loss, _ = step(state, *args)
    jax.block_until_ready(loss)
    log(f"compile+first: {time.time() - t0:.1f}s  loss={float(loss):.4f}")

    for _ in range(WARMUP):
        state, loss, _ = step(state, *args)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(TRAIN_ITERS):
        state, loss, _ = step(state, *args)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    step_s = dt / TRAIN_ITERS
    img_s = b / step_s
    log(f"{img_s:.2f} img/s  ({step_s * 1000:.1f} ms/step of {b})")
    mfu = None
    if flops:
        mfu = flops / step_s / (PEAK_BF16_TFLOPS * 1e12)
        log(f"XLA-counted flops/step: {flops / 1e12:.2f} TF  MFU: {mfu * 100:.1f}%")
    if emit:
        _emit(
            "joint deq+lin+hal training images/sec/chip (batch 16 @ 256^2, full losses)",
            img_s,
            CPU_BASELINE_TRAIN_IMG_S,
        )
    return img_s, mfu


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true",
                   help="measure ONLY the joint train step and emit its metric")
    p.add_argument("--forward-only", action="store_true",
                   help="skip the train-step clause of the default bench")
    p.add_argument("--batch", type=int, default=None,
                   help="override the forward bench batch (experiments only)")
    a = p.parse_args()
    if a.batch:
        BATCH = a.batch
    if a.train:
        bench_train()
    elif a.forward_only:
        bench_forward()
    else:
        # Default: one JSON line carrying BOTH BASELINE.json clauses — the
        # headline forward metric plus the joint-training numbers the north
        # star names (VERDICT r2 weak #7) as extra keys.
        img_s, batch = bench_forward(emit=False)
        train_img_s, mfu = bench_train(emit=False)
        _emit(
            "HDR-Real 512x512 images/sec/chip (full 4-net pipeline)",
            img_s,
            CPU_BASELINE_IMG_S,
            {
                "batch": batch,
                "train_img_s": round(train_img_s, 3),
                "train_vs_baseline": round(train_img_s / CPU_BASELINE_TRAIN_IMG_S, 2),
                "train_mfu_pct": round(mfu * 100, 1) if mfu else None,
            },
        )
