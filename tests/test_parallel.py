"""Multi-chip sharding validation on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import DequantizationNet
from singlehdr_tpu.parallel import make_mesh, replicate, shard_batch
from singlehdr_tpu.parallel.mesh import batch_sharding
from singlehdr_tpu.train.state import init_net_state
from singlehdr_tpu.train.steps import deq_train_step


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["spatial"] == 2
    with pytest.raises(ValueError):
        make_mesh(8, spatial=3)


def test_shard_batch_layout(rng):
    mesh = make_mesh(8, spatial=2)
    batch = {
        "img": rng.rand(4, 64, 64, 3).astype(np.float32),
        "crf": rng.rand(4, 1024).astype(np.float32),
        "t": np.float32(1.0),
    }
    out = shard_batch(mesh, batch)
    assert out["img"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "spatial", None, None
    )
    assert out["crf"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_allclose(np.asarray(out["img"]), batch["img"])


def test_data_parallel_matches_single_device(rng):
    """Gradient all-reduce equivalence: one deq train step on an 8-way data
    mesh must produce the same params as the unsharded step (SURVEY.md §4d)."""
    b = 8
    ldr = rng.rand(b, 32, 32, 3).astype(np.float32)
    jpeg = np.clip(ldr + 0.05 * rng.randn(b, 32, 32, 3).astype(np.float32), 0, 1)
    mask = np.ones((b, 1, 1, 1), np.float32)

    def run(mesh):
        state = init_net_state(
            DequantizationNet(), jax.random.PRNGKey(0), jnp.zeros((b, 32, 32, 3)), 1e-4
        )
        if mesh is not None:
            state = replicate(mesh, state)
            args = shard_batch(mesh, (ldr, jpeg, mask))
        else:
            args = (jnp.asarray(ldr), jnp.asarray(jpeg), jnp.asarray(mask))
        new_state, loss, _ = deq_train_step(state, *args)
        return float(loss), jax.tree.leaves(new_state.params)

    loss_single, params_single = run(None)
    loss_mesh, params_mesh = run(make_mesh(8, spatial=1))
    np.testing.assert_allclose(loss_mesh, loss_single, rtol=1e-5)
    for a, c in zip(params_mesh, params_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_spatial_sharding_forward_matches(rng):
    """Row-sharded conv forward (XLA halo exchange) equals unsharded result."""
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    net = DequantizationNet()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))

    fwd = jax.jit(lambda v, a: net.apply(v, a))
    ref = np.asarray(fwd(variables, jnp.asarray(x)))

    mesh = make_mesh(8, spatial=4)
    xs = jax.device_put(x, batch_sharding(mesh, spatial_dim=1))
    vs = replicate(mesh, variables)
    out = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)
