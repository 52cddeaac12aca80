"""Train state containers and optimizer factories.

One generic ``NetState`` pytree covers every configuration: a single net
(pretraining), the deq+lin+hal trio under one optimizer (joint training,
joint_training.py:185-186), or all four nets under one optimizer (finetune,
finetune_real_dataset.py:177-178).  Params/batch-stats of multi-net states are
dicts keyed 'deq'/'lin'/'hal'/'ref', matching the ReverseCameraPipeline
submodule names so checkpoints interchange between drivers.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

# Keras Adam epsilon (the reference optimizer, tf_utils.py:172).
ADAM_EPS = 1e-7


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with Keras defaults (b1=.9, b2=.999, eps=1e-7)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=ADAM_EPS)


@struct.dataclass
class NetState:
    """Parameters + BN statistics + optimizer state for one training unit."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any, new_batch_stats: Any) -> "NetState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def init_net_state(
    module: nn.Module,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    learning_rate: float,
    jit_init: bool = True,
) -> NetState:
    """Initialize one module's state (init is jitted — eager init dispatches
    thousands of tiny ops over the device tunnel)."""
    init = jax.jit(module.init) if jit_init else module.init
    variables = init(rng, sample_input)
    return _state_from_variables(variables, learning_rate)


def init_multi_state(
    modules: Mapping[str, nn.Module],
    samples: Mapping[str, jnp.ndarray],
    rng: jax.Array,
    learning_rate: float,
    jit_init: bool = True,
) -> NetState:
    """One optimizer over several nets; params/batch_stats keyed by net name."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    keys = jax.random.split(rng, len(modules))
    for key, (name, module) in zip(keys, sorted(modules.items())):
        init = jax.jit(module.init) if jit_init else module.init
        variables = init(key, samples[name])
        params[name] = variables["params"]
        stats[name] = variables.get("batch_stats", {})
    return _state_from_variables(
        {"params": params, "batch_stats": stats}, learning_rate
    )


def _state_from_variables(variables: Mapping[str, Any], learning_rate: float) -> NetState:
    tx = make_optimizer(learning_rate)
    params = variables["params"]
    return NetState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def net_variables(state: NetState, name: str | None = None) -> Dict[str, Any]:
    """Assemble flax apply() variables for the whole state or one sub-net."""
    params = state.params if name is None else state.params[name]
    stats = state.batch_stats if name is None else state.batch_stats.get(name, {})
    return {"params": params, "batch_stats": stats}


def param_count(tree: Any) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree.leaves(tree))
