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

# The reference's OWN TF2-CPU throughput, measured 2026-08-19 on this host
# with tools/measure_ref_tf_baseline.py (the reference's real models/losses
# on the TF2 CPU backend, unique-input per-iter loop) — replacing the
# round-1 JAX-CPU self-proxy (VERDICT r3 item 3; the proxy numbers were
# 0.174 fwd / 0.104 train via tools/measure_cpu_baseline.py).
# forward: full 4-net inference, 512x512, batch 1 — two runs measured
# 0.1808 and 0.1668 img/s (5.5-6.0 s/img); mean recorded.
CPU_BASELINE_IMG_S = 0.174
# joint train: deq+lin+hal step, batch 16 @ 256^2, full losses incl. VGG
# perceptual + TV, one Adam — 68.8 s/step over a 5-step unique-input run.
CPU_BASELINE_TRAIN_IMG_S = 0.233

# Best measured throughput config on v5e.  Large batches became compilable
# once the round-2 memory work landed (fused upsample-convs + NCHW feature
# stack), and the round-3 decoder fixes cut the arena again: XLA temp arena
# at 512^2 is 12.1 GiB @ b96 / 13.0 @ b120 / 12.9 @ b128 dense (b144 fails
# compile).  The fused hal encoder chain costs +6 GiB of arena at b96 (skip
# + pooled outputs and halo-pad copies live alongside the dense-path
# buffers), so it only fits — and only wins — at small batches.  Policy
# lives in the model (hallucination.EncoderStage): fusion chains from the
# 3-ch stem or not at all (enc2-only measured a 2% loss at b128, fe1e277),
# bounded per stage by hallucination._fused_enc_allowed's measured arena
# budget; bench leaves the env unset so that gate decides.  Measured
# 2026-08-18 (unique-input pipelined loop): b64+fused 100.5, b96 108.2,
# b120 113.4, b128 125.5 img/s dense — b128 is the headline config.
BATCH = 128
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


def _sync(x):
    """Force execution of ``x``'s dependency chain and wait for it.

    Timing fences read one element back to the host instead of calling
    ``block_until_ready``: a readback provably waits for the full dependency
    chain on every runtime, while the axon tunnel's ``block_until_ready``
    semantics proved unreliable across host-image updates (observed returning
    early right after the 2026-08-18 reboot).  The readback costs one tunnel
    round-trip (~30 ms), which sits outside every timed region.

    The tap is a scalar *slice* — never ``ravel`` — because a ravel of a
    non-default-layout output materializes a full copy, and at the headline
    batch the pipeline already sits within ~300 MB of HBM: the copy is what
    tipped b96 into OOM (2026-08-18)."""
    idx = tuple(0 for _ in getattr(x, "shape", ()))
    return np.asarray(jax.device_get(x[idx] if idx else x))


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
    batch = BATCH
    # Fused-encoder policy: leave SINGLEHDR_FUSED_ENC unset so the model's
    # per-stage gate decides (hallucination.EncoderStage: chain-from-stem
    # + fit budget) — with the NHWC skip boundary (BENCH_NOTES r4) the hal
    # chain is fused through b120 @ 512^2 and dense at b128, where the
    # fused stem fails compile and the batch-lane-aligned dense run is the
    # throughput headline anyway (1019.7 ms vs b120's 1058).
    # An explicit SINGLEHDR_FUSED_ENC overrides only the fit-budget check;
    # chain-from-stem is structural (see hallucination._fused_enc_allowed).
    pipe = ReverseCameraPipeline(dtype=jnp.dtype(DTYPE))
    rng = np.random.RandomState(0)

    def build(batch):
        ldr = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.float32)
        t0 = time.time()
        variables = jax.jit(pipe.init)(jax.random.PRNGKey(0), ldr[:1])
        _sync(jax.tree.leaves(variables)[0])
        log(f"init: {time.time() - t0:.1f}s")
        # The input batch is donated: its 300 MB buffer is dead the moment the
        # first conv reads it, and at the headline batch that margin decides
        # whether the workload fits HBM.  Every call site hands fwd a fresh
        # buffer (warmup/timing loops rebuild x via mix).
        fwd = jax.jit(lambda v, x: pipe.apply(v, x).hdr, donate_argnums=(1,))
        t0 = time.time()
        out = fwd(variables, jnp.copy(ldr))
        _sync(out)
        log(f"compile+first: {time.time() - t0:.1f}s")
        return fwd, variables, ldr

    fwd, variables, ldr = build(batch)

    # The axon runtime memoizes identical dispatches (same executable + same
    # input buffers re-run in ~0 ms — measured 2026-08-18), so a naive
    # same-input timing loop reports fantasy throughput.  Every iteration
    # therefore feeds a UNIQUE input buffer (mix stamps the iteration index
    # into the batch), while iterations stay INDEPENDENT of each other so the
    # runtime can pipeline dispatch/transfer like real inference traffic —
    # dependency-chaining them instead was measured 15% slower at b96+, pure
    # serialization artifact.  A scalar tap per output (read back at the end)
    # keeps every execution live; tap/mix cost ~1 ms/iter inside the timed
    # region.
    tap = jax.jit(lambda out: out[0, 0, 0, 0])
    mix = jax.jit(lambda base, s: base + jnp.float32(0.0) * s)
    for i in range(WARMUP):
        _sync(fwd(variables, mix(ldr, jnp.float32(-1.0 - i))))
    taps = []
    t0 = time.time()
    for i in range(ITERS):
        out = fwd(variables, mix(ldr, jnp.float32(i)))  # input donated
        taps.append(tap(out))
        del out  # free the batch buffer as soon as execution completes
        if i >= 2:
            # bound the dispatch queue: at most ~3 batch inputs in flight
            # (deeper queues stack up donated-input buffers against the
            # near-peak HBM arena; 2-deep already hides the dispatch gap)
            _sync(taps[i - 2])
    for s in taps[-2:]:
        _sync(s)
    dt = time.time() - t0
    img_s = batch * ITERS / dt
    log(f"{img_s:.2f} img/s  ({dt / ITERS * 1000:.1f} ms/batch of {batch})")
    # Regression tripwire (VERDICT r4 weak #5): the headline rests on the
    # fused U-Net encoder engaging (2.04x end-to-end at b128: 125.5 vs 61.5
    # img/s dense).  If the supported()/budget gate ever regresses the bench
    # must FAIL loudly, not silently report ~62 img/s as the new normal.
    from singlehdr_tpu.models.unet import ResidualUNet

    probe = ResidualUNet()
    if (
        jax.default_backend() == "tpu"
        and batch * SIZE * SIZE > probe.max_pack_pixels  # packed regime off
    ):
        n_fused = probe._fused_prefix((batch, SIZE, SIZE, 3))
        assert n_fused >= 3, (
            f"fused U-Net encoder prefix regressed: {n_fused} stages engage "
            f"at b{batch} @ {SIZE}^2 (expected >= 3) — see models/unet.py "
            "gate and BENCH_NOTES r4 'fused U-Net encoder A/B'"
        )
        log(f"fused U-Net prefix engaged: {n_fused} stages")
    if emit:
        _emit(
            "HDR-Real 512x512 images/sec/chip (full 4-net pipeline)",
            img_s,
            CPU_BASELINE_IMG_S,
            {"batch": batch},
        )
    return img_s, batch


def bench_train(emit=True, remat=False):
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
    _sync(jax.tree.leaves(state.params)[0])
    log(f"init: {time.time() - t0:.1f}s")
    # remat=True recomputes each net's forward in the backward instead of
    # storing activations — the byte-cut experiment the r3 roofline analysis
    # named (bwd ~ 2x fwd HBM traffic; MXU floor sits 3x below the HBM
    # floor, so FLOPs are the cheap currency here).
    step = make_joint_train_step(
        Vgg16Features(), dtype=jnp.dtype(DTYPE), remat=remat
    )

    flops = None
    hbm_floor_s = None
    try:
        lowered = step.lower(state, *args)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
        byt = float(cost.get("bytes accessed", 0.0))
        if byt:
            hbm_floor_s = byt / 819e9
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
    loss0 = float(loss)  # forces execution before the clock is read
    log(f"compile+first: {time.time() - t0:.1f}s  loss={loss0:.4f}")

    # the optimizer state threads through iterations, so the final loss
    # readback fences the whole chain (see _sync)
    for _ in range(WARMUP):
        state, loss, _ = step(state, *args)
    _sync(loss)
    t0 = time.time()
    for _ in range(TRAIN_ITERS):
        state, loss, _ = step(state, *args)
    _sync(loss)
    dt = time.time() - t0
    step_s = dt / TRAIN_ITERS
    img_s = b / step_s
    log(f"{img_s:.2f} img/s  ({step_s * 1000:.1f} ms/step of {b})")
    mfu = None
    if flops:
        mfu = flops / step_s / (PEAK_BF16_TFLOPS * 1e12)
        log(f"XLA-counted flops/step: {flops / 1e12:.2f} TF  MFU: {mfu * 100:.1f}%")
    # Feed-vs-device utilization (VERDICT r3 item 7): the device step above
    # times synthetic on-device batches; real training is gated by the host
    # input pipeline, whose measured rate tools/measure_feed.py records.
    feed_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FEED.json")
    if os.path.exists(feed_file):
        try:
            with open(feed_file) as f:
                feed = json.load(f)
            fr = feed.get("feed_img_s")
            if fr and feed.get("batch") == b and feed.get("size") == s:
                log(
                    f"host feed rate: {fr:.1f} img/s "
                    f"({feed.get('host_cores')} core(s), "
                    f"native={feed.get('native_available')}) -> device "
                    f"utilization in real training ~{min(1.0, fr / img_s) * 100:.0f}%"
                )
        except Exception as e:
            log(f"BENCH_FEED.json unreadable: {e}")
    floor_ratio = None
    if hbm_floor_s:
        floor_ratio = step_s / hbm_floor_s
        log(
            f"HBM floor ratio: {floor_ratio:.3f} "
            f"(measured {step_s * 1e3:.1f} ms / floor {hbm_floor_s * 1e3:.1f} ms)"
        )
        # Floor-ratio gate (VERDICT r3 item 6): the "structurally
        # memory-bound" claim is enforced, not asserted — a regression that
        # decouples the step from its own XLA-counted HBM floor (e.g.
        # accidentally-stored f32 activations, a serialization bug) fails
        # the bench loudly.  Budget 1.25 vs 1.12 measured (r3); escape
        # hatch for experiments on unfamiliar chips.
        if floor_ratio > 1.25 and os.environ.get("SINGLEHDR_SKIP_FLOOR_GATE") != "1":
            sys.exit(
                f"train step at {floor_ratio:.2f}x its HBM floor "
                f"(gate: 1.25; SINGLEHDR_SKIP_FLOOR_GATE=1 to override)"
            )
    if emit:
        _emit(
            "joint deq+lin+hal training images/sec/chip (batch 16 @ 256^2, full losses)",
            img_s,
            CPU_BASELINE_TRAIN_IMG_S,
            {
                "mfu_pct": round(mfu * 100, 1) if mfu else None,
                "floor_ratio": round(floor_ratio, 3) if floor_ratio else None,
            },
        )
    return img_s, mfu


def _run_child(argv):
    """Run one bench clause in a FRESH process and return (record, stderr).

    The forward workload at the ladder's top batches sits within ~1 GB of the
    16 GB HBM, and a failed compile/execute attempt does not reliably return
    its memory to the same process under the axon tunnel (observed
    2026-08-18: after one OOM'd attempt even a 200 MB transfer failed,
    while a fresh process could allocate 15.5 GB).  Subprocess isolation
    makes every attempt start from clean HBM; it also keeps the forward
    phase's working set from colliding with the train clause's peak."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *argv, "--child"],
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr)
    rec = None
    if proc.returncode == 0:
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
    return rec, proc.stderr


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true",
                   help="measure ONLY the joint train step and emit its metric")
    p.add_argument("--remat", nargs="?", const="full", default=None,
                   choices=("full", "convs"),
                   help="with --train: rematerialize net forwards in the "
                        "backward.  'full' (the bare-flag default) recomputes "
                        "everything — measured 23%% SLOWER at b16 @ 256^2, it "
                        "exists to fit memory (BENCH_NOTES r4); 'convs' saves "
                        "conv/matmul outputs and recomputes only the "
                        "elementwise BN/activation chains between them")
    p.add_argument("--forward-only", action="store_true",
                   help="measure ONLY the forward clause (single attempt, no "
                        "batch ladder) and emit its metric")
    p.add_argument("--batch", type=int, default=None,
                   help="override the forward bench batch (experiments only)")
    p.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    a = p.parse_args()
    if a.batch:
        BATCH = a.batch
    if a.train:
        bench_train(remat=True if a.remat == "full" else (a.remat or False))
    elif a.forward_only:
        bench_forward()
    else:
        # Default: one JSON line carrying BOTH BASELINE.json clauses — the
        # headline forward metric plus the joint-training numbers the north
        # star names (VERDICT r2 weak #7) as extra keys.  Each clause runs in
        # a fresh subprocess (see _run_child); the batch ladder descends on
        # OOM only, any other failure surfaces.
        ladder = sorted(
            {b for b in (BATCH, 128, 96, 64) if b <= BATCH}, reverse=True
        )
        fwd_rec = None
        for i, b in enumerate(ladder):
            fwd_rec, err = _run_child(["--forward-only", "--batch", str(b)])
            if fwd_rec is not None:
                break
            if not _is_oom(RuntimeError(err)) or i == len(ladder) - 1:
                sys.exit(f"forward bench failed at batch {b} (not OOM)")
            log(f"batch {b} OOM; retrying at {ladder[i + 1]}")
        train_rec, err = _run_child(["--train"])
        if train_rec is None:
            sys.exit("train bench failed")
        _emit(
            "HDR-Real 512x512 images/sec/chip (full 4-net pipeline)",
            fwd_rec["value"],
            CPU_BASELINE_IMG_S,
            {
                "batch": fwd_rec.get("batch"),
                "train_img_s": train_rec["value"],
                "train_vs_baseline": train_rec["vs_baseline"],
                "train_mfu_pct": train_rec.get("mfu_pct"),
            },
        )
