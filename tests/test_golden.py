"""Golden self-parity tests: freeze the numerics of every net and key op.

Fixed-seed inits on fixed inputs must keep producing the same outputs across
refactors (CPU, f32).  Goldens live in tests/golden/*.npz; regenerate
deliberately with REGEN_GOLDEN=1 when a numeric change is intended, and
explain the change in the commit message.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
    ReverseCameraPipeline,
)
from singlehdr_tpu.ops.curves import apply_rf, monotonic_rf
from singlehdr_tpu.ops.degradation import simulate_capture
from singlehdr_tpu.ops.histogram import linearization_features

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
_REGEN = os.environ.get("REGEN_GOLDEN") == "1"


def _input(shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32)
    )


def _check(name: str, value: jnp.ndarray, atol: float = 2e-5):
    """Compare against (or regenerate) the stored golden array."""
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    arr = np.asarray(value, np.float32)
    if _REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, value=arr)
        if not _REGEN:
            pytest.skip(f"golden {name} created; re-run to compare")
    want = np.load(path)["value"]
    np.testing.assert_allclose(arr, want, atol=atol)


CASES = {
    "deq": (DequantizationNet, (2, 32, 32, 3)),
    "lin": (LinearizationNet, (2, 32, 32, 3)),
    "hal": (HallucinationNet, (2, 32, 32, 3)),
    "ref": (RefinementNet, (2, 32, 32, 9)),
}


@pytest.mark.parametrize("name", list(CASES))
def test_net_forward_golden(name):
    cls, shape = CASES[name]
    net = cls()
    x = _input(shape)
    variables = net.init(jax.random.PRNGKey(42), x)
    out = net.apply(variables, x)
    # store a decimated slice to keep goldens small but representative
    sliced = out[:, ::16] if out.ndim == 2 else out[:, ::4, ::4, :]
    _check(f"net_{name}", sliced)


def test_pipeline_forward_golden():
    pipe = ReverseCameraPipeline()
    x = _input((1, 64, 64, 3))
    variables = pipe.init(jax.random.PRNGKey(42), x)
    out = pipe.apply(variables, x)
    _check("pipeline_hdr", out.hdr[:, ::8, ::8, :])
    _check("pipeline_invcrf", out.invcrf[:, ::16])


def test_ops_golden():
    x = _input((2, 16, 16, 3), seed=3) * 1.2 - 0.1
    rf = monotonic_rf(_input((2, 1024), seed=4))
    _check("apply_rf", apply_rf(x, rf, impl="xla"))
    _check("lin_features", linearization_features(jnp.clip(x, 0, 1))[:, ::4, ::4, :])


def test_degradation_golden():
    hdr = _input((2, 32, 32, 3), seed=5)
    crf = monotonic_rf(_input((2, 1024), seed=6))
    t = jnp.asarray([0.5, 2.0], jnp.float32)
    sim = simulate_capture(jax.random.PRNGKey(9), hdr, crf, t)
    _check("degradation_ldr", sim.ldr[:, ::4, ::4, :])
    _check("degradation_hdr_t", sim.hdr_t[:, ::4, ::4, :])
