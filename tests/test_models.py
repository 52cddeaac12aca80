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
    Vgg16Features,
)


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


# ------------------------------------------------------------- Dequantization


def test_dequantization_shape_and_params(key):
    x = jnp.zeros((1, 64, 64, 3))
    variables = DequantizationNet().init(key, x)
    y = DequantizationNet().apply(variables, x)
    assert y.shape == x.shape
    # reference reports ~2.0M params (SURVEY.md §2 row 1)
    assert 1.8e6 < n_params(variables["params"]) < 2.2e6


def test_dequantization_residual_is_bounded(key):
    x = jnp.full((1, 32, 32, 3), 0.5)
    variables = DequantizationNet().init(key, x)
    y = DequantizationNet().apply(variables, x)
    # y = x + tanh(r): deviation from input bounded by 1
    assert float(jnp.max(jnp.abs(y - x))) <= 1.0 + 1e-6


# ----------------------------------------------------------------- Refinement


def test_refinement_shape_params_and_nonneg(key):
    abc = jax.random.uniform(key, (1, 64, 64, 9))
    variables = RefinementNet().init(key, abc)
    y = RefinementNet().apply(variables, abc)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.min(y)) >= 0.0  # ReLU output
    assert 1.1e6 < n_params(variables["params"]) < 1.5e6


# -------------------------------------------------------------- Linearization


def test_linearization_predicts_monotone_invcrf(key):
    x = jax.random.uniform(key, (2, 64, 64, 3))
    net = LinearizationNet()
    variables = net.init(key, x)
    invcrf = net.apply(variables, x)
    assert invcrf.shape == (2, 1024)
    inv = np.asarray(invcrf)
    np.testing.assert_allclose(inv[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(inv[:, -1], 1.0, atol=1e-5)
    assert np.all(np.diff(inv, axis=-1) >= -1e-7)
    # reference reports ~1.2M params (SURVEY.md §2 row 2)
    assert 1.0e6 < n_params(variables["params"]) < 1.5e6


def test_linearization_train_mode_updates_batch_stats(key):
    x = jax.random.uniform(key, (2, 64, 64, 3))
    net = LinearizationNet()
    variables = net.init(key, x)
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


# -------------------------------------------------------------- Hallucination


def test_hallucination_shape_params_nonneg(key):
    x = jax.random.uniform(key, (1, 64, 64, 3))
    net = HallucinationNet()
    variables = net.init(key, x)
    y = net.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.min(y)) >= 0.0
    # reference reports ~24.6M params (SURVEY.md §2 row 7)
    assert 23e6 < n_params(variables["params"]) < 27e6


# ----------------------------------------------------------------------- VGG


def test_vgg16_feature_shapes():
    vgg = Vgg16Features()
    x = jnp.zeros((2, 64, 64, 3))
    p1, p2, p3 = vgg(x)
    assert p1.shape == (2, 32, 32, 64)
    assert p2.shape == (2, 16, 16, 128)
    assert p3.shape == (2, 8, 8, 256)


def test_vgg16_deterministic_surrogate():
    a = Vgg16Features()
    b = Vgg16Features()
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    np.testing.assert_allclose(np.asarray(a(x)[0]), np.asarray(b(x)[0]))


# ------------------------------------------------------------------- Pipeline


def test_pipeline_end_to_end_shapes(key):
    ldr = jax.random.uniform(key, (1, 64, 64, 3))
    pipe = ReverseCameraPipeline()
    variables = pipe.init(key, ldr)
    out = pipe.apply(variables, ldr)
    assert out.hdr.shape == ldr.shape
    assert out.c_pred.shape == ldr.shape
    assert out.b_pred.shape == ldr.shape
    assert out.a_pred.shape == ldr.shape
    assert out.invcrf.shape == (1, 1024)
    assert out.alpha.shape == ldr.shape
    # C is clipped to [0,1]; outputs are finite
    assert float(jnp.min(out.c_pred)) >= 0.0
    assert float(jnp.max(out.c_pred)) <= 1.0
    for leaf in (out.hdr, out.a_pred, out.b_pred):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_pipeline_param_tree_has_named_subnets(key):
    ldr = jnp.zeros((1, 64, 64, 3))
    variables = ReverseCameraPipeline().init(key, ldr)
    assert set(variables["params"].keys()) == {"deq", "lin", "hal", "ref"}
    # per-net params restore 1:1 into the composite subtree
    solo = DequantizationNet().init(key, ldr)
    assert (
        jax.tree.structure(solo["params"])
        == jax.tree.structure(variables["params"]["deq"])
    )


def test_pipeline_without_refinement(key):
    ldr = jnp.zeros((1, 32, 32, 3))
    pipe = ReverseCameraPipeline(use_refinement=False)
    variables = pipe.init(key, ldr)
    out = pipe.apply(variables, ldr)
    np.testing.assert_array_equal(np.asarray(out.hdr), np.asarray(out.a_pred))
    assert "ref" not in variables["params"]
