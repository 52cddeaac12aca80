import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
    Vgg16Features,
)
from singlehdr_tpu.train import steps as steps_mod
from singlehdr_tpu.train.checkpoint import CheckpointManager, restore_pretrained_subnets
from singlehdr_tpu.train.metrics import Mean, MetricsWriter, psnr, ssim
from singlehdr_tpu.train.state import (
    init_multi_state,
    init_net_state,
    net_variables,
)

HW = 32
LR = 1e-4


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def vgg():
    return Vgg16Features()


def _synth_batch(rng, b=2, hw=HW):
    ldr = rng.rand(b, hw, hw, 3).astype(np.float32)
    jpeg = np.clip(ldr + rng.randn(b, hw, hw, 3).astype(np.float32) * 0.02, 0, 1)
    clipped = rng.rand(b, hw, hw, 3).astype(np.float32)
    hdr_t = clipped * rng.uniform(1.0, 2.0)
    mask = np.ones((b, 1, 1, 1), np.float32)
    invcrf = np.tile(np.linspace(0, 1, 1024, dtype=np.float32), (b, 1))
    return {k: jnp.asarray(v) for k, v in dict(
        ldr=ldr, jpeg=jpeg, clipped=clipped, hdr_t=hdr_t, mask=mask, invcrf=invcrf
    ).items()}


def test_deq_pretrain_step_descends(key, rng):
    b = _synth_batch(rng)
    state = init_net_state(DequantizationNet(), key, b["jpeg"], LR)
    losses = []
    for _ in range(4):
        state, loss, _ = steps_mod.deq_train_step(state, b["ldr"], b["jpeg"], b["mask"])
        losses.append(float(loss))
    assert int(state.step) == 4
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_lin_pretrain_step_runs(key, rng):
    b = _synth_batch(rng)
    state = init_net_state(LinearizationNet(), key, b["ldr"], LR)
    state2, loss, aux = steps_mod.lin_train_step(
        state, b["ldr"], b["clipped"], b["mask"], b["invcrf"]
    )
    assert np.isfinite(float(loss))
    assert float(aux["crf_mse"]) >= 0.0
    # BN stats changed
    before = jax.tree.leaves(state.batch_stats)
    # note: state was donated; compare against freshly initialized stats
    after = jax.tree.leaves(state2.batch_stats)
    assert len(before) == len(after)


def test_hal_pretrain_step_runs(key, rng, vgg):
    b = _synth_batch(rng)
    step_fn = steps_mod.make_hal_train_step(vgg)
    state = init_net_state(HallucinationNet(), key, b["clipped"], LR)
    state, loss, aux = step_fn(state, b["hdr_t"], b["clipped"], b["mask"])
    assert np.isfinite(float(loss))
    assert aux["y_final"].shape == b["clipped"].shape


def test_masked_sample_contributes_no_gradient(key, rng):
    b = _synth_batch(rng, b=2)
    mask = jnp.asarray([[[[1.0]]], [[[0.0]]]])
    state = init_net_state(DequantizationNet(), key, b["jpeg"], LR)

    # gradient with sample-1 masked must equal gradient with sample-1 replaced
    def grad_for(jpeg, ldr):
        def loss_fn(params):
            pred = DequantizationNet().apply({"params": params, "batch_stats": {}}, jpeg)
            from singlehdr_tpu.ops.losses import masked_l2, scalar_from_per_sample

            return scalar_from_per_sample(masked_l2(jnp.clip(pred, 0, 1), ldr, mask))

        return jax.grad(loss_fn)(state.params)

    g1 = grad_for(b["jpeg"], b["ldr"])
    jpeg_perturbed = b["jpeg"].at[1].set(jnp.clip(b["jpeg"][1] + 0.3, 0, 1))
    g2 = grad_for(jpeg_perturbed, b["ldr"])
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_joint_train_step(key, rng, vgg):
    b = _synth_batch(rng)
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
    }
    samples = {"deq": b["jpeg"], "lin": b["ldr"], "hal": b["clipped"]}
    state = init_multi_state(modules, samples, key, 1e-5)
    step_fn = steps_mod.make_joint_train_step(vgg)
    state, loss, aux = step_fn(
        state, b["ldr"], b["jpeg"], b["clipped"], b["hdr_t"], b["mask"], b["invcrf"]
    )
    assert np.isfinite(float(loss))
    for k in ("loss_deq", "loss_lin", "loss_hal"):
        assert aux[k].shape == (2, 1, 1, 1)
    assert aux["a_pred"].shape == b["clipped"].shape
    assert int(state.step) == 1


def test_finetune_train_step(key, rng):
    b = 2
    ldr = jnp.asarray(rng.rand(b, HW, HW, 3).astype(np.float32))
    hdr = jnp.asarray(rng.rand(b, HW, HW, 3).astype(np.float32))
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
        "ref": RefinementNet(),
    }
    samples = {
        "deq": ldr,
        "lin": ldr,
        "hal": ldr,
        "ref": jnp.concatenate([ldr, ldr, ldr], -1),
    }
    state = init_multi_state(modules, samples, key, 1e-5)
    step_fn = steps_mod.make_finetune_train_step()
    state, loss, aux = step_fn(state, ldr, hdr)
    assert np.isfinite(float(loss))
    assert aux["out"].shape == hdr.shape
    # renorm: output mean pinned to 0.5 per sample
    np.testing.assert_allclose(
        np.asarray(jnp.mean(aux["out"], axis=(1, 2, 3))), 0.5, atol=1e-3
    )


# ----------------------------------------------------------------- checkpoint


def test_checkpoint_roundtrip(tmp_path, key, rng):
    b = _synth_batch(rng)
    state = init_net_state(DequantizationNet(), key, b["jpeg"], LR)
    state, _, _ = steps_mod.deq_train_step(state, b["ldr"], b["jpeg"], b["mask"])
    mgr = CheckpointManager(str(tmp_path / "deq"))
    mgr.save(state)
    mgr.wait()

    fresh = init_net_state(DequantizationNet(), jax.random.PRNGKey(1), b["jpeg"], LR)
    restored = mgr.restore(fresh)
    assert int(restored.step) == int(state.step)
    for a, c in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    mgr.close()


def test_checkpoint_restore_noop_when_empty(tmp_path, key, rng):
    b = _synth_batch(rng)
    state = init_net_state(DequantizationNet(), key, b["jpeg"], LR)
    mgr = CheckpointManager(str(tmp_path / "empty"))
    out = mgr.restore(state)
    assert out is state
    mgr.close()


def test_restore_pretrained_subnets(tmp_path, key, rng):
    b = _synth_batch(rng)
    solo = init_net_state(DequantizationNet(), key, b["jpeg"], LR)
    solo, _, _ = steps_mod.deq_train_step(solo, b["ldr"], b["jpeg"], b["mask"])
    mgr = CheckpointManager(str(tmp_path / "deq"))
    mgr.save(solo)
    mgr.wait()
    mgr.close()

    modules = {"deq": DequantizationNet(), "lin": LinearizationNet()}
    samples = {"deq": b["jpeg"], "lin": b["ldr"]}
    multi = init_multi_state(modules, samples, jax.random.PRNGKey(9), 1e-5)
    merged = restore_pretrained_subnets(multi, {"deq": str(tmp_path / "deq")}, 1e-5)
    for a, c in zip(
        jax.tree.leaves(merged.params["deq"]), jax.tree.leaves(solo.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # untouched subnet unchanged
    for a, c in zip(
        jax.tree.leaves(merged.params["lin"]), jax.tree.leaves(multi.params["lin"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# -------------------------------------------------------------------- metrics


def test_mean_tracker():
    m = Mean()
    m.update(np.asarray([1.0, 3.0]))
    m.update(2.0)
    np.testing.assert_allclose(m.result(), 2.0)
    m.reset()
    assert m.result() == 0.0


def test_psnr_ssim():
    a = jnp.zeros((1, 32, 32, 3)) + 0.5
    assert float(psnr(a, a)) > 100
    np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-5)
    noisy = a + 0.1
    assert float(psnr(noisy, a)) == pytest.approx(20.0, abs=0.1)
    assert float(ssim(noisy, a)) < 1.0


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path / "logs"))
    w.scalar("loss", 1.5, step=1)
    w.image("img", np.zeros((2, 8, 8, 3), np.float32), step=1)
    w.histogram("h", np.arange(10), step=1)
    w.flush()
    w.close()
    events = (tmp_path / "logs" / "events.jsonl").read_text().strip()
    assert '"loss": 1.5' in events


def test_joint_step_with_remat_matches(key, rng, vgg):
    """Rematerialized joint step computes the same update as the plain one."""
    b = _synth_batch(rng)
    modules = {
        "deq": DequantizationNet(),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
    }
    samples = {"deq": b["jpeg"], "lin": b["ldr"], "hal": b["clipped"]}
    args = (b["ldr"], b["jpeg"], b["clipped"], b["hdr_t"], b["mask"], b["invcrf"])

    s1 = init_multi_state(modules, samples, key, 1e-5)
    s2 = init_multi_state(modules, samples, key, 1e-5)
    _, l1, _ = steps_mod.make_joint_train_step(vgg)(s1, *args)
    _, l2, _ = steps_mod.make_joint_train_step(vgg, remat=True)(s2, *args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
