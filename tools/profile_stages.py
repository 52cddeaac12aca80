#!/usr/bin/env python
"""Per-stage TPU timing for the 4-net pipeline at a chosen batch/size.

Times each net's jitted forward and the full pipeline, with the packed-lane
conv fast path on and off, to localize regressions (e.g. a per-net win that
loses end-to-end at a different batch size).  Usage:

    python tools/profile_stages.py --batch 64 --size 512 [--nets deq,ref]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Host-readback fence: provably waits for ``x``'s dependency chain on
    every runtime (the tunnel's block_until_ready proved unreliable across
    host-image updates — see bench.py).  Scalar slice, not ravel: an eager
    ravel of a non-default-layout output materializes a full copy, which can
    tip a near-HBM-peak workload into OOM."""
    leaf = jax.tree.leaves(x)[0]
    idx = tuple(0 for _ in getattr(leaf, "shape", ()))
    return np.asarray(jax.device_get(leaf[idx] if idx else leaf))


# v5e HBM bandwidth (see bench.py's roofline floors)
HBM_GBPS = 819.0


def _floor(ms: float, gb: float) -> str:
    """HBM-roofline annotation: floor ms at v5e bandwidth and measured/floor.

    Ratios near 1.0 mean the stage is already pinned to its memory traffic —
    the lever there is cutting bytes (layout/fusion), not scheduling; large
    ratios mark stages with recoverable time (VERDICT r3 item 5)."""
    if not gb:
        return ""
    floor_ms = gb / HBM_GBPS * 1000.0
    return f", HBM floor {floor_ms:.0f} ms ratio {ms / floor_ms:.2f}"


def measure(fn, *args, iters=6, warmup=2):
    """Compile once; return (ms, flops_TF, bytes_GB, compile_s).

    The axon runtime memoizes identical dispatches (same executable + same
    input buffers re-run in ~0 ms), so iterations are dependency-chained:
    the first array arg carries a 0-weighted scalar tap of the previous
    output, making every dispatch unique and ordered (see bench.py)."""
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    tf_, gb = 0.0, 0.0
    try:
        c = compiled.cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        tf_ = float(c.get("flops", 0)) / 1e12
        gb = float(c.get("bytes accessed", 0)) / 1e9
    except Exception:
        pass
    _sync(compiled(*args))
    compile_s = time.time() - t0

    leaves, treedef = jax.tree.flatten(args)
    taint = jax.jit(
        lambda leaf, out: leaf
        + (jnp.ravel(jax.tree.leaves(out)[0])[0] * 0).astype(leaf.dtype)
    )

    def chained(prev_out):
        return treedef.unflatten([taint(leaves[0], prev_out)] + leaves[1:])

    out = compiled(*args)
    for _ in range(warmup):
        out = compiled(*chained(out))
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*chained(out))
    _sync(out)
    ms = (time.time() - t0) / iters * 1000.0
    return ms, tf_, gb, compile_s


def check_parity(args):
    """Packed vs dense: forward and gradient parity on the real device.

    The packed path is pure XLA (autodiff'd by construction), but layout bugs
    would only show on TPU, so this asserts numerically there.  f32, small
    batch (packing engages below the max_pack_pixels threshold).
    """
    from singlehdr_tpu.models import DequantizationNet, RefinementNet

    # TPU f32 matmuls default to 3-pass bf16 emulation whose rounding differs
    # between the packed and dense conv shapes (~1e-2 relative on individual
    # grad entries); compare under true-f32 precision instead.
    jax.config.update("jax_default_matmul_precision", "highest")
    b = min(args.batch, 4)
    size = min(args.size, 128)
    rng = np.random.RandomState(0)
    for name, cls, cin in (("deq", DequantizationNet, 3), ("ref", RefinementNet, 9)):
        x = jnp.asarray(rng.rand(b, size, size, cin), jnp.float32)
        cot = jnp.asarray(rng.rand(b, size, size, 3), jnp.float32)
        fast, dense = cls(fast_convs=True), cls(fast_convs=False)
        v = jax.jit(dense.init)(jax.random.PRNGKey(0), x[:1])

        def loss(mod):
            return jax.jit(
                lambda v, x: jnp.vdot(mod.apply(v, x), cot).astype(jnp.float32)
            )

        f_fast, f_dense = loss(fast), loss(dense)
        y_f, y_d = f_fast(v, x), f_dense(v, x)
        fwd_err = abs(float(y_f) - float(y_d)) / max(abs(float(y_d)), 1e-9)
        g_f = jax.jit(jax.grad(f_fast))(v, x)
        g_d = jax.jit(jax.grad(f_dense))(v, x)
        errs = jax.tree_util.tree_map(
            lambda a, b: float(
                jnp.max(jnp.abs(a - b)) / (1e-9 + jnp.max(jnp.abs(b)))
            ),
            g_f, g_d,
        )
        worst = max(jax.tree_util.tree_leaves(errs))
        print(f"{name}: fwd rel err {fwd_err:.2e}  worst grad rel err {worst:.2e}",
              flush=True)
        assert fwd_err < 1e-5 and worst < 1e-4, f"{name} parity FAILED"
    print("parity OK", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--nets", default="deq,lin,hal,ref,pipe")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument(
        "--variants", default="both", choices=["both", "fast", "dense"],
        help="which conv-path variants to time for deq/ref/pipe; at b>16 @ "
        "512^2 the packed path auto-disables (max_pack_pixels), so 'dense' "
        "avoids compiling the same program twice at the headline batch",
    )
    p.add_argument(
        "--check", action="store_true",
        help="assert packed-vs-dense forward AND gradient parity on-device "
        "(run with a small --batch; uses f32 for tight tolerances)",
    )
    args = p.parse_args()
    if args.check:
        return check_parity(args)

    from singlehdr_tpu.models import (
        DequantizationNet,
        HallucinationNet,
        LinearizationNet,
        RefinementNet,
        ReverseCameraPipeline,
    )

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.size
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    x9 = jnp.asarray(rng.rand(b, s, s, 9), jnp.float32)
    key = jax.random.PRNGKey(0)
    wanted = set(args.nets.split(","))

    variants = {"both": (True, False), "fast": (True,), "dense": (False,)}[
        args.variants
    ]

    def bench(name, module_fn, sample):
        for fast in variants:
            mod = module_fn(fast)
            variables = jax.jit(mod.init)(key, sample[:1])
            ms, tf_, gb, compile_s = measure(
                lambda v, x, m=mod: m.apply(v, x), variables, sample,
                iters=args.iters,
            )
            print(
                f"{name:5s} fast={str(fast):5s} {ms:8.1f} ms/batch"
                f"  (compile {compile_s:.0f}s, {tf_:.2f} TF @ "
                f"{tf_ / ms * 1000:.0f} TF/s, {gb:.1f} GB @ "
                f"{gb / ms * 1000:.0f} GB/s{_floor(ms, gb)})",
                flush=True,
            )

    if "deq" in wanted:
        bench("deq", lambda f: DequantizationNet(dtype=dt, fast_convs=f), x3)
    if "ref" in wanted:
        bench("ref", lambda f: RefinementNet(dtype=dt, fast_convs=f), x9)
    for nm, maker in (("lin", LinearizationNet), ("hal", HallucinationNet)):
        if nm not in wanted:
            continue
        mod = maker(dtype=dt)
        variables = jax.jit(mod.init)(key, x3[:1])
        ms, tf_, gb, compile_s = measure(
            lambda v, x, m=mod: m.apply(v, x), variables, x3, iters=args.iters
        )
        print(
            f"{nm:5s}             {ms:8.1f} ms/batch  (compile {compile_s:.0f}s, "
            f"{tf_:.2f} TF @ {tf_ / ms * 1000:.0f} TF/s, {gb:.1f} GB @ "
            f"{gb / ms * 1000:.0f} GB/s{_floor(ms, gb)})",
            flush=True,
        )
    if "pipe" in wanted:
        for fast in variants:
            mod = ReverseCameraPipeline(dtype=dt, fast_convs=fast)
            variables = jax.jit(mod.init)(key, x3[:1])
            ms, tf_, gb, compile_s = measure(
                lambda v, x, m=mod: m.apply(v, x).hdr, variables, x3,
                iters=args.iters,
            )
            print(
                f"pipe  fast={str(fast):5s} {ms:8.1f} ms/batch"
                f"  ({b / ms * 1000:.1f} img/s; compile {compile_s:.0f}s, "
                f"{tf_:.2f} TF @ {tf_ / ms * 1000:.0f} TF/s, {gb:.1f} GB @ "
                f"{gb / ms * 1000:.0f} GB/s{_floor(ms, gb)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
