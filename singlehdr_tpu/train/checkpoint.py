"""Orbax-backed checkpoint/resume.

Replaces the reference's tf.train.Checkpoint + CheckpointManager(max_to_keep=5)
auto-restore scheme (tf_utils.py:149-169).  Each training unit (deq / lin /
hal / ref / jnt) gets its own directory; the stored tree is
{step, params, batch_stats, opt_state} — explicitly named, unlike the
reference's model slot that is literally called ``lin`` for every net
(tf_utils.py:159), a quirk its own weight importer must special-case.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from singlehdr_tpu.train.state import NetState

MAX_TO_KEEP = 5


class CheckpointManager:
    """Save/auto-restore one NetState under a directory."""

    def __init__(self, directory: str, max_to_keep: int = MAX_TO_KEEP):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: NetState, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else int(step)
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: NetState) -> NetState:
        """Restore the latest checkpoint into `state` (returns it unchanged if
        none exists) — mirrors the reference's restore-if-present behavior."""
        step = self._mgr.latest_step()
        if step is None:
            return state
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )

    def restore_from_spec(self, spec: "StateSpec") -> Optional[NetState]:
        """Rebuild a NetState purely from shape/dtype specs + the latest
        checkpoint — usable after a device failure invalidated (donated) the
        live buffers.  Returns None when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "step": spec.step,
            "params": spec.params,
            "batch_stats": spec.batch_stats,
            "opt_state": spec.opt_state,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return NetState(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            tx=spec.tx,
        )

    def close(self) -> None:
        self._mgr.close()


class StateSpec:
    """Abstract (shape/dtype) snapshot of a NetState, safe to hold across
    device failures — contains no device buffers."""

    def __init__(self, state: NetState):
        as_spec = lambda t: jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t
        )
        self.step = as_spec(state.step)
        self.params = as_spec(state.params)
        self.batch_stats = as_spec(state.batch_stats)
        self.opt_state = as_spec(state.opt_state)
        self.tx = state.tx


def restore_pretrained_subnets(
    state: NetState, directories: dict[str, str], learning_rate: float = 0.0
) -> NetState:
    """Load pretrained weights for subnets of a multi-net state.

    The joint/finetune drivers restore each net's own pretraining checkpoint
    before training with a fresh combined optimizer (joint_training.py:94-124,
    finetune_real_dataset.py:91-126; the restored per-net optimizer slots are
    vestigial there — SURVEY.md §5).  Each directory may hold either a solo
    NetState checkpoint (its ``params`` IS the subnet tree) or a multi-net
    checkpoint containing the subnet by name (e.g. a joint/finetune state) —
    the saved structure is inspected rather than assumed.  The combined
    optimizer is re-initialized over the merged params.
    """
    del learning_rate  # kept for API stability; optimizer comes from `state`
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, directory in directories.items():
        if name not in params:
            raise KeyError(f"state has no subnet {name!r}")
        mgr = CheckpointManager(directory)
        step = mgr.latest_step
        if step is None:
            mgr.close()
            continue
        raw = mgr._mgr.restore(step)  # saved structure, no template
        mgr.close()
        saved_params = raw["params"]
        saved_stats = raw.get("batch_stats") or {}
        if isinstance(saved_params, dict) and name in saved_params:
            saved_params = saved_params[name]
            if isinstance(saved_stats, dict):
                saved_stats = saved_stats.get(name) or {}
        want = jax.tree.structure(params[name])
        got = jax.tree.structure(saved_params)
        if want != got:
            raise ValueError(
                f"checkpoint at {directory} does not match subnet {name!r}: "
                f"expected {want}, got {got}"
            )
        params[name] = saved_params
        stats[name] = saved_stats
    return state.replace(
        params=params,
        batch_stats=stats,
        opt_state=state.tx.init(params),
    )
