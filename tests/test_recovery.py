"""Elastic recovery: a transient device failure mid-training resumes from the
latest checkpoint instead of crashing the run."""

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.data.datasets import ArrayDataset, ProductDataset, ZipDataset
from singlehdr_tpu.models import DequantizationNet
from singlehdr_tpu.train.loop import LoopConfig, run_synth_training
from singlehdr_tpu.train.state import init_net_state
from singlehdr_tpu.train.steps import deq_train_step


def _tiny_dataset(rng):
    hdrs = rng.rand(4, 32, 32, 3).astype(np.float32)
    crfs = np.tile(np.linspace(0, 1, 1024, dtype=np.float32), (3, 1))
    return ProductDataset(
        [
            ArrayDataset(hdrs),
            ZipDataset([ArrayDataset(crfs), ArrayDataset(crfs)]),
            ArrayDataset(np.asarray([0.5, 1.0, 2.0], np.float32)),
        ]
    )


def test_training_recovers_from_transient_failure(tmp_path, rng):
    failures = {"armed": False, "raised": 0}

    def flaky_step(state, *args):
        # fail exactly once, after the first checkpoint exists
        if failures["armed"] and failures["raised"] == 0:
            failures["raised"] += 1
            raise jax.errors.JaxRuntimeError("injected transient device loss")
        out = deq_train_step(state, *args)
        if int(out.state.step) >= 2:
            failures["armed"] = True
        return out

    state = init_net_state(
        DequantizationNet(), jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), 1e-4
    )
    cfg = LoopConfig(
        batch_size=2,
        iterations=6,
        ckpt_every=2,
        log_every=100,
        image_log_every=100,
        n_workers=2,
        use_jpeg=False,
        prefetch=1,
    )
    final = run_synth_training(
        module_name="deq",
        state=state,
        step_fn=flaky_step,
        dataset=_tiny_dataset(rng),
        cfg=cfg,
        ckpt_dir=str(tmp_path / "ck"),
        log_dir=str(tmp_path / "logs"),
        batch_to_args=lambda b: (b["ldr"], b["jpeg"], b["mask"]),
    )
    assert failures["raised"] == 1          # the failure did happen
    assert int(final.step) == 6             # and training still completed


def test_final_offcadence_step_is_checkpointed(tmp_path, rng):
    """A run whose last step falls off the ckpt_every cadence must still save
    it — downstream stages restore 'latest', and silently handing them a
    cadence-stale state cost the r3 anchor 400 steps per pretrain net."""
    from singlehdr_tpu.train.checkpoint import CheckpointManager

    state = init_net_state(
        DequantizationNet(), jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), 1e-4
    )
    cfg = LoopConfig(
        batch_size=2,
        iterations=5,           # off-cadence final step (5 % 3 != 0)
        ckpt_every=3,
        log_every=100,
        image_log_every=100,
        n_workers=2,
        use_jpeg=False,
        prefetch=1,
    )
    run_synth_training(
        module_name="deq",
        state=state,
        step_fn=deq_train_step,
        dataset=_tiny_dataset(rng),
        cfg=cfg,
        ckpt_dir=str(tmp_path / "ck"),
        log_dir=str(tmp_path / "logs"),
        batch_to_args=lambda b: (b["ldr"], b["jpeg"], b["mask"]),
    )
    restored = CheckpointManager(str(tmp_path / "ck")).restore(
        init_net_state(
            DequantizationNet(), jax.random.PRNGKey(1),
            jnp.zeros((2, 32, 32, 3)), 1e-4,
        )
    )
    assert int(restored.step) == 5
