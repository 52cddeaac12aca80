#!/usr/bin/env python
"""Measure the CPU-proxy baselines used by bench.py's vs_baseline ratios.

Default: full 4-net pipeline forward at 512x512 on the jax CPU backend
(images/sec) — copy into bench.py:CPU_BASELINE_IMG_S.

--train: one joint deq+lin+hal training step (reference config: batch 16 at
256x256, full losses incl. VGG perceptual — joint_training.py:20-22) on the
CPU backend — copy into bench.py:CPU_BASELINE_TRAIN_IMG_S.

Run once per machine.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np


def measure_forward():
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
    print(f"CPU baseline (forward): {iters / dt:.3f} images/sec ({dt / iters:.2f} s/img)")


def measure_train(batch=16, size=256, iters=2):
    from singlehdr_tpu.models import (
        DequantizationNet,
        HallucinationNet,
        LinearizationNet,
        Vgg16Features,
    )
    from singlehdr_tpu.train.state import init_multi_state
    from singlehdr_tpu.train.steps import make_joint_train_step

    rng = np.random.RandomState(0)
    ldr = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    batch_args = (
        ldr,
        jnp.clip(ldr + 0.02, 0, 1),                       # jpeg
        jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32),  # clipped_hdr_t
        jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32) * 2.0,  # hdr_t
        jnp.ones((batch, 1, 1, 1), jnp.float32),          # mask
        jnp.tile(jnp.linspace(0, 1, 1024, dtype=jnp.float32), (batch, 1)),  # invcrf
    )
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
    }
    samples = {"deq": ldr, "lin": ldr, "hal": ldr}
    state = init_multi_state(modules, samples, jax.random.PRNGKey(0), 1e-5)
    step = make_joint_train_step(Vgg16Features())
    t0 = time.time()
    state, loss, _ = step(state, *batch_args)
    jax.block_until_ready(loss)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        state, loss, _ = step(state, *batch_args)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(
        f"CPU baseline (joint train): {batch * iters / dt:.3f} images/sec "
        f"({dt / iters:.1f} s/step of {batch})"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    args = p.parse_args()
    if args.train:
        measure_train()
    else:
        measure_forward()
