"""Training loops wiring data, degradation, steps, checkpoints, and metrics.

One generic loop drives all the reference's training configurations
(SURVEY.md §3.1-3.3): per-net pretraining on HDR-Synth, joint deq+lin+hal, and
HDR-Real finetuning of the full pipeline.  The HDR-Synth loop pipelines its
three phases — host batch assembly, device degradation, host JPEG — so the JPEG
round-trip of batch k+1 overlaps the train step of batch k.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.data.jpeg import jpeg_roundtrip_batch
from singlehdr_tpu.data.loader import RandomSampleLoader
from singlehdr_tpu.parallel.mesh import replicate, shard_batch
from singlehdr_tpu.ops.degradation import (
    jpeg_quality_ladder,
    loss_mask_from_levels,
    simulate_capture,
)
from singlehdr_tpu.train.checkpoint import CheckpointManager, StateSpec
from singlehdr_tpu.train.metrics import Mean, MetricsWriter
from singlehdr_tpu.train.state import NetState

# Device/runtime failures considered transient (the hosted-TPU tunnel drops
# periodically); anything else propagates immediately.
_TRANSIENT_ERRORS = (jax.errors.JaxRuntimeError,)
_MAX_RECOVERIES = 3
# A blocked device call can't be interrupted from Python; the watchdog at
# least makes the stall visible instead of a silent hang.
_WATCHDOG_SECS = 300.0


class _StepWatchdog:
    """Prints a warning if a step hasn't completed within the deadline."""

    def __init__(self, seconds: float = _WATCHDOG_SECS):
        import threading

        self._seconds = seconds
        self._timer: "threading.Timer | None" = None
        self._threading = threading

    def arm(self, step: int) -> None:
        self.disarm()
        t = self._threading.Timer(
            self._seconds,
            lambda: print(
                f"[watchdog] step {step} has been running >"
                f"{self._seconds:.0f}s — device or tunnel may be unresponsive; "
                "the run will resume from the last checkpoint if the device "
                "errors out",
                flush=True,
            ),
        )
        t.daemon = True
        t.start()
        self._timer = t

    def disarm(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None


@dataclasses.dataclass
class LoopConfig:
    batch_size: int = 16
    iterations: int = 5_000_000     # the reference's "EPOCHS" are iterations
    ckpt_every: int = 1000
    log_every: int = 100
    image_log_every: int = 1000
    n_workers: int = 16
    seed: int = 0
    use_jpeg: bool = True           # False keeps degradation fully on-device
    prefetch: int = 2               # host batches prepared ahead of the step
    prefetch_producers: int = 2     # concurrent next_batch producers
    profile_dir: str | None = None  # capture a jax.profiler trace when set
    profile_steps: tuple = (10, 15)  # [start, stop) step window of the trace


class SynthBatchPipeline:
    """HDR-Synth step inputs: loader -> device sim -> host JPEG -> mask.

    Yields dicts with ldr / jpeg / clipped_hdr_t / hdr_t / mask / invcrf.

    All per-batch host arrays ride ONE device transfer: the development
    tunnel (and any RPC-attached device) charges a large fixed latency per
    transfer (~170 ms measured, BENCH_NOTES r5), so four separate uploads
    (hdr/crf/invcrf/t) cost ~4x what one packed buffer does.  The HDR patch
    travels as float16 (mean-normalized radiance; 2^-10 relative input
    quantization) and is unpacked/cast to f32 on device.
    """

    def __init__(self, dataset, cfg: LoopConfig):
        self._loader = RandomSampleLoader(
            dataset, cfg.batch_size, n_workers=cfg.n_workers, seed=cfg.seed
        )
        self._cfg = cfg
        self._sim = jax.jit(simulate_capture)
        self._qualities = jpeg_quality_ladder(cfg.batch_size)
        self._key = jax.random.PRNGKey(cfg.seed)
        self._key_lock = __import__("threading").Lock()
        self._unpack = None

    def _make_unpack(self, shapes):
        """Jitted unpacker for the packed upload: byte-slices back into
        (hdr f32, crf, invcrf, t) with static shapes."""
        (bs, h, w, c), kshape = shapes[0], shapes[1]

        def unpack(buf):
            sizes = [bs * h * w * c * 2] + [
                int(np.prod(s)) * 4 for s in shapes[1:]
            ]
            offs = np.concatenate([[0], np.cumsum(sizes)])
            hdr = jax.lax.bitcast_convert_type(
                buf[: offs[1]].reshape(bs * h * w * c, 2), jnp.float16
            ).reshape(bs, h, w, c).astype(jnp.float32)
            rest = []
            for i, s in enumerate(shapes[1:], start=1):
                flat = buf[offs[i]: offs[i + 1]].reshape(int(np.prod(s)), 4)
                rest.append(
                    jax.lax.bitcast_convert_type(flat, jnp.float32).reshape(s)
                )
            return (hdr, *rest)

        return jax.jit(unpack)

    def next_batch(self) -> dict:
        hdr, crf, invcrf, t = self._loader.read_batch()
        payload = np.concatenate(
            [
                np.ascontiguousarray(hdr, np.float16).view(np.uint8).ravel(),
                np.ascontiguousarray(crf, np.float32).view(np.uint8).ravel(),
                np.ascontiguousarray(invcrf, np.float32).view(np.uint8).ravel(),
                np.ascontiguousarray(t, np.float32).view(np.uint8).ravel(),
            ]
        )
        if self._unpack is None:
            self._unpack = self._make_unpack(
                (hdr.shape, crf.shape, invcrf.shape, np.shape(t))
            )
        hdr, crf, invcrf, t = self._unpack(jnp.asarray(payload))
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        sim = self._sim(sub, hdr, crf, t)
        if self._cfg.use_jpeg:
            jpg_u8 = jpeg_roundtrip_batch(
                np.asarray(sim.quantized_u8), self._qualities
            )
            jpg_u8 = jnp.asarray(jpg_u8)
        else:
            jpg_u8 = sim.quantized_u8
        return {
            "ldr": sim.ldr,
            "jpeg": jpg_u8.astype(jnp.float32) / 255.0,
            "clipped_hdr_t": sim.clipped_hdr_t,
            "hdr_t": sim.hdr_t,
            "mask": loss_mask_from_levels(jpg_u8),
            "invcrf": invcrf,
        }

    def close(self):
        self._loader.close()


class _PrefetchError:
    """Sentinel carrying a producer exception across the prefetch queue."""

    def __init__(self, error: BaseException):
        self.error = error


class _Prefetcher:
    """Run a batch producer in background threads, `depth` batches ahead.

    Overlaps the host half of the pipeline (loader dequeue + JPEG round-trip)
    with the device step; JAX dispatch is thread-safe so the producer can
    enqueue the on-device simulate_capture as well.  ``producers > 1``
    overlaps the *internal* latency of successive next_batch calls — on a
    high-latency device attachment (the dev tunnel: ~170 ms per transfer,
    BENCH_NOTES r5) one producer serializes upload -> readback -> upload per
    batch, while two producers interleave them (batch *order* across
    producers is not deterministic; the loader's sample stream is shared).
    """

    def __init__(self, produce: Callable[[], dict], depth: int,
                 producers: int = 1):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def loop():
            while not self._stop.is_set():
                try:
                    batch = produce()
                except Exception as e:  # surface producer failures to next()
                    batch = _PrefetchError(e)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=1.0)
                        break
                    except queue.Full:
                        continue
                if isinstance(batch, _PrefetchError):
                    return  # thread ends; the consumer re-raises

        self._threads = [
            threading.Thread(target=loop, daemon=True, name=f"prefetch{i}")
            for i in range(max(1, producers))
        ]
        for t in self._threads:
            t.start()

    def next(self) -> dict:
        item = self._q.get()
        if isinstance(item, _PrefetchError):
            raise item.error
        return item

    def alive(self) -> bool:
        return any(t.is_alive() for t in self._threads)

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


def run_synth_training(
    *,
    module_name: str,
    state: NetState,
    step_fn: Callable,
    dataset,
    cfg: LoopConfig,
    ckpt_dir: str,
    log_dir: str,
    batch_to_args: Callable[[dict], tuple],
    writer: Optional[MetricsWriter] = None,
    image_taps: tuple = (),
    mesh=None,
) -> NetState:
    """Pretraining / joint loop over HDR-Synth (train.py:246-310 shape).

    With ``mesh`` set, parameters replicate across the mesh and batches shard
    over ('data', 'spatial'); XLA inserts the gradient all-reduce over ICI.
    """
    writer = writer or MetricsWriter(log_dir)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    if mesh is not None:
        state = replicate(mesh, state)
    start_step = int(state.step)
    pipeline = SynthBatchPipeline(dataset, cfg)
    prefetcher = _Prefetcher(pipeline.next_batch, cfg.prefetch, cfg.prefetch_producers)
    tracker = Mean(f"loss_{module_name}")
    spec = StateSpec(state)
    watchdog = _StepWatchdog()
    recoveries = 0
    try:
        it = start_step
        while it < cfg.iterations:
            t0 = time.perf_counter()
            if cfg.profile_dir and it == start_step + cfg.profile_steps[0]:
                jax.profiler.start_trace(cfg.profile_dir)
            if cfg.profile_dir and it == start_step + cfg.profile_steps[1]:
                jax.profiler.stop_trace()
            try:
                watchdog.arm(it)
                batch = prefetcher.next()
                if mesh is not None:
                    batch = shard_batch(mesh, batch)
                state, loss, aux = step_fn(state, *batch_to_args(batch))
                jax.block_until_ready(loss)
                watchdog.disarm()
                recoveries = 0
            except _TRANSIENT_ERRORS:
                watchdog.disarm()
                # the step's donated buffers are gone; rebuild from the last
                # checkpoint (elastic restart-from-checkpoint, SURVEY.md §5)
                recoveries += 1
                if recoveries > _MAX_RECOVERIES:
                    raise
                restored = mgr.restore_from_spec(spec)
                if restored is None:
                    raise
                state = restored if mesh is None else replicate(mesh, restored)
                it = int(state.step)
                time.sleep(min(30.0, 5.0 * recoveries))
                if not prefetcher.alive():  # producer died on the same failure
                    prefetcher.close()
                    prefetcher = _Prefetcher(pipeline.next_batch, cfg.prefetch, cfg.prefetch_producers)
                continue
            it += 1
            step = int(state.step)
            tracker.update(float(loss))
            if step % cfg.log_every == 0 or step == 1:
                step_time = time.perf_counter() - t0
                writer.scalar(f"{module_name}/loss", tracker.result(), step)
                writer.scalar(f"{module_name}/step_time_s", step_time, step)
                print(
                    f"[{module_name}] step {step}  loss {tracker.result():.5f}  "
                    f"({step_time:.2f}s/step)",
                    flush=True,
                )
                tracker.reset()
            if step % cfg.image_log_every == 0 or step == 1:
                for tag in image_taps:
                    if tag in aux:
                        writer.image(f"{module_name}/{tag}", aux[tag], step)
                writer.image(f"{module_name}/jpeg", batch["jpeg"], step)
            if step % cfg.ckpt_every == 0 or step == 1:
                mgr.save(state)
        # Final save: without it, a run whose last step is off-cadence hands
        # downstream stages a checkpoint up to ckpt_every-1 steps stale
        # (e.g. a 1000-step pretrain at cadence 600 restored from step 600).
        last = int(state.step)
        if last > start_step and last != 1 and last % cfg.ckpt_every != 0:
            mgr.save(state)
        return state
    finally:
        watchdog.disarm()
        prefetcher.close()
        pipeline.close()
        mgr.wait()
        mgr.close()
        writer.flush()


def run_real_finetune(
    *,
    state: NetState,
    step_fn: Callable,
    pipeline,  # HdrRealPipeline
    epochs: int,
    ckpt_dir: str,
    log_dir: str,
    writer: Optional[MetricsWriter] = None,
    mesh=None,
) -> NetState:
    """HDR-Real finetune loop (finetune_real_dataset.py:190-225 shape):
    epoch passes with per-epoch checkpointing and summaries."""
    writer = writer or MetricsWriter(log_dir)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    if mesh is not None:
        state = replicate(mesh, state)
    tracker = Mean("loss_ref")
    full_bs = None
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        tracker.reset()
        aux = {}
        losses = []
        for ldr, hdr in pipeline.epoch():
            if full_bs is None:
                full_bs = int(ldr.shape[0])
            if mesh is not None:
                # Mesh-safe tail batch: pad short batches up to the full batch
                # size by repeating trailing samples so every step takes the
                # sharded path with one compiled shape (a short unsharded
                # batch against mesh-replicated state would force a recompile
                # and a slow mixed-layout step).  The repeats slightly
                # overweight the tail samples once per epoch — preferable to
                # dropping them (the reference trains on tail batches too:
                # finetune_real_dataset.py:63-74 batches without
                # drop_remainder).
                n_data = mesh.shape["data"]
                target = -(-full_bs // n_data) * n_data  # divisible by the axis
                short = target - int(ldr.shape[0])
                if short > 0:
                    ldr = np.concatenate([ldr, np.repeat(ldr[-1:], short, axis=0)])
                    hdr = np.concatenate([hdr, np.repeat(hdr[-1:], short, axis=0)])
                ldr, hdr = shard_batch(mesh, (ldr, hdr))
                state, loss, aux = step_fn(
                    state, jnp.asarray(ldr), jnp.asarray(hdr)
                )
            else:
                # Tunnel-latency discipline (mirrors the synth feed fixes,
                # BENCH_NOTES r5 "fixed latency per transfer"): ldr+hdr ride
                # ONE packed upload and split on-device; the per-step loss is
                # NOT synced — float(loss) each step serializes an extra
                # ~170 ms readback into every 4-image batch.
                packed = jnp.asarray(np.concatenate([ldr, hdr], axis=0))
                b = ldr.shape[0]
                state, loss, aux = step_fn(state, packed[:b], packed[b:])
            losses.append(aux["loss_ref"])
            if len(losses) > 4:
                # bound the dispatch queue without serializing: sync a loss
                # scalar a few steps behind the head
                losses[-5] = float(losses[-5])
        for v in losses:
            tracker.update(float(v))
        epoch_time = time.perf_counter() - t0
        writer.scalar("ref/loss", tracker.result(), epoch)
        writer.scalar("ref/epoch_time_s", epoch_time, epoch)
        print(
            f"[ref] epoch {epoch}  loss {tracker.result():.5f}  ({epoch_time:.1f}s)",
            flush=True,
        )
        for tag in ("c_pred", "b_pred", "a_pred", "out"):
            if tag in aux:
                writer.image(f"ref/{tag}", aux[tag], epoch)
        if "out" in aux:
            writer.histogram("ref/out_histogram", np.asarray(aux["out"]), epoch)
        mgr.save(state)
    mgr.wait()
    mgr.close()
    writer.flush()
    return state
