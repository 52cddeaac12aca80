#!/usr/bin/env python
"""Host input-pipeline feed rate at the training shapes (VERDICT r3 item 7).

The quality-anchor runs are host-feed bound (1-core host, BENCH_NOTES r2);
this tool measures what the feed actually delivers so the train bench can
report feed-vs-device utilization instead of asserting it.  It times:

  * the JPEG batch round-trip alone — native C++ codec vs the cv2 thread
    pool (the codec is already wired as the preferred path in
    data/jpeg.jpeg_roundtrip_batch; this quantifies what that buys), and
  * the full SynthBatchPipeline.next_batch (loader -> on-device
    simulate_capture -> host JPEG -> loss mask) with the codec on and off —
    the img/s the training loop's prefetcher can sustain.

Writes BENCH_FEED.json at the repo root; bench.py --train reads it (when
present) to print feed-vs-device utilization to stderr.  Reference analog:
dataset.py:315-363 (the 24-process pump feeding train.py's loop).

    python tools/measure_feed.py --batch 16 --size 256
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import numpy as np


def time_jpeg_roundtrip(batch, size, iters=8):
    """Native codec vs cv2 pool on the same uint8 batch (ms/batch each)."""
    from singlehdr_tpu.data import jpeg as jpeg_mod
    from singlehdr_tpu.data import native_jpeg
    from singlehdr_tpu.ops.degradation import jpeg_quality_ladder

    rng = np.random.RandomState(0)
    u8 = (rng.rand(batch, size, size, 3) * 255).astype(np.uint8)
    qualities = jpeg_quality_ladder(batch)

    out = {}
    paths = [("cv2", False)]
    if native_jpeg.available():
        paths.append(("native", True))
    for name, use_native in paths:
        fn = (
            (lambda: native_jpeg.jpeg_roundtrip_batch_native(u8, qualities))
            if use_native
            else (
                lambda: np.stack(
                    [
                        jpeg_mod._pool()
                        .submit(jpeg_mod._roundtrip_one, u8[i], q)
                        .result()
                        for i, q in enumerate(qualities)
                    ]
                )
            )
        )
        fn()  # warm (pool spin-up / codec init)
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        out[name] = (time.perf_counter() - t0) / iters * 1000.0
    return out


def time_pipeline(synth_dir, batch, size, workers, n_batches, native,
                  producers=1):
    """Full feed rate (img/s) with the codec on/off.

    ``producers=1`` times raw sequential next_batch calls; ``producers>1``
    times consumption through the training loop's _Prefetcher, which is what
    the train step actually sees (the producers overlap the per-batch
    transfer latency — BENCH_NOTES r5)."""
    from singlehdr_tpu.data import native_jpeg
    from singlehdr_tpu.data.synth import get_train_dataset
    from singlehdr_tpu.train.loop import (
        LoopConfig,
        SynthBatchPipeline,
        _Prefetcher,
    )

    orig = native_jpeg.available
    if not native:
        native_jpeg.available = lambda: False
    try:
        dataset = get_train_dataset(synth_dir, patch_size=size)
        pipe = SynthBatchPipeline(
            dataset,
            LoopConfig(batch_size=batch, n_workers=workers, use_jpeg=True),
        )
        prefetcher = None
        try:
            import jax

            next_fn = pipe.next_batch
            if producers > 1:
                prefetcher = _Prefetcher(pipe.next_batch, depth=2,
                                         producers=producers)
                next_fn = prefetcher.next
            for _ in range(2 * producers):  # warm: compiles sim, fills queues
                b = next_fn()
            jax.block_until_ready(b["ldr"])
            t0 = time.perf_counter()
            for _ in range(n_batches):
                b = next_fn()
                # the consumer's view: mask is the last host-side product
                np.asarray(b["mask"])
            dt = time.perf_counter() - t0
            return batch * n_batches / dt
        finally:
            if prefetcher is not None:
                prefetcher.close()
            pipe.close()
    finally:
        native_jpeg.available = orig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--producers", type=int, default=2)
    p.add_argument("--n_batches", type=int, default=12)
    p.add_argument("--scenes", type=int, default=12)
    p.add_argument("--workdir", default="/tmp/shdr_feed_bench")
    p.add_argument("--out", default=os.path.join(REPO, "BENCH_FEED.json"))
    args = p.parse_args()

    from quality_anchor import synth_scene

    from singlehdr_tpu.data import native_jpeg
    from singlehdr_tpu.data.hdr_io import write_hdr

    synth = os.path.join(args.workdir, "synth")
    os.makedirs(synth, exist_ok=True)
    rng = np.random.RandomState(7)
    for i in range(args.scenes):
        path = os.path.join(synth, f"s{i:03d}.hdr")
        if not os.path.exists(path):
            write_hdr(path, synth_scene(rng, 512, 768))

    jpeg_ms = time_jpeg_roundtrip(args.batch, args.size)
    print(
        "jpeg round-trip ms/batch:",
        {k: round(v, 1) for k, v in jpeg_ms.items()},
        flush=True,
    )

    rec = {
        "batch": args.batch,
        "size": args.size,
        "workers": args.workers,
        "host_cores": os.cpu_count(),
        "jpeg_ms_per_batch": {k: round(v, 2) for k, v in jpeg_ms.items()},
        "native_available": native_jpeg.available(),
    }
    for native in ([True] if native_jpeg.available() else []) + [False]:
        img_s = time_pipeline(
            synth, args.batch, args.size, args.workers, args.n_batches, native
        )
        key = "feed_img_s_native" if native else "feed_img_s_cv2"
        rec[key] = round(img_s, 2)
        print(f"feed rate ({'native' if native else 'cv2'}): {img_s:.1f} img/s",
              flush=True)
    # what the train loop consumes: prefetcher with concurrent producers
    img_s = time_pipeline(
        synth, args.batch, args.size, args.workers, args.n_batches,
        native_jpeg.available(), producers=args.producers,
    )
    rec["feed_img_s_prefetched"] = round(img_s, 2)
    rec["producers"] = args.producers
    print(f"feed rate (prefetched x{args.producers}): {img_s:.1f} img/s",
          flush=True)
    rec["feed_img_s"] = rec["feed_img_s_prefetched"]

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
