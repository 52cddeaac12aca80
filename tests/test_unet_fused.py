"""Fused U-Net encoder stage (ops/pallas/unet_stage_pallas.py).

Mosaic-only primitives (pltpu.roll/bitcast) don't run under the CPU
interpreter, so the kernel itself is validated on hardware (the TPU-gated
tests below, exercised by tools/profile_stages.py runs and the bench); the
CPU suite pins (a) the XLA fallback oracle against the dense flax path it
must equal, (b) the static gate, and (c) that the fused path's param-owner
modules initialize identically to the dense convs (one checkpoint layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from singlehdr_tpu.models.unet import DownStage, ResidualUNet, _ConvParams
from singlehdr_tpu.ops.pallas import unet_stage_pallas as m

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("kernel", [3, 5, 7])
def test_xla_reference_matches_dense_stage(rng, kernel):
    """Oracle == leaky convs + the next stage's entry avg-pool (models/unet)."""

    class TwoConvs(nn.Module):
        @nn.compact
        def __call__(self, x):
            # DownStage without the entry pool = the fused stage's conv pair
            return DownStage(8, kernel, fast_convs=False, name="s")(
                x, pre_pooled=True
            )

    x = jnp.asarray(rng.rand(2, 16, 16, 5).astype(np.float32))
    mod = TwoConvs()
    v = mod.init(jax.random.PRNGKey(0), x)
    act = mod.apply(v, x)
    from singlehdr_tpu.ops.resize import avg_pool_2x2

    pooled = avg_pool_2x2(act)
    p = v["params"]["s"]
    pooled2, act2 = m._xla_reference(
        x, p["conv1"]["kernel"], p["conv1"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(act), np.asarray(act2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2), atol=1e-5)


def test_shape_gate():
    assert m.supported((64, 512, 512, 3), 7, 16)            # stems @ 512^2
    assert m.supported((64, 16, 256, 256), 5, 32, nchw=True)  # down2 chained
    assert m.supported((64, 32, 128, 128), 3, 64, nchw=True)  # down3 chained
    assert not m.supported((64, 64, 64, 64), 3, 128, nchw=True)   # W % 128
    assert not m.supported((64, 512, 500, 3), 7, 16)        # W % 128
    assert not m.supported((64, 24, 512, 3), 7, 16)         # H % 16
    assert not m.supported((64, 512, 512, 3), 9, 16)        # K not in 3/5/7


def test_fused_prefix_geometry():
    net = ResidualUNet()
    depth = net._fused_prefix((4, 512, 512, 3))
    if jax.default_backend() == "tpu":
        assert depth > 0  # fused path engages on hardware
    else:
        assert depth == 0  # fused path is TPU-only


def test_param_owner_matches_dense_conv_init():
    """_ConvParams must produce the exact init nn.Conv would (same path)."""
    from singlehdr_tpu.models.layers import conv

    class Dense(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv(16, 7, name="c")(x)

    class Owner(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _ConvParams(16, 7, name="c")(x.shape[-1])

    x = jnp.zeros((1, 8, 8, 3))
    key = jax.random.PRNGKey(3)
    pd = Dense().init(key, x)["params"]["c"]
    po = Owner().init(key, x)["params"]["c"]
    assert pd["kernel"].shape == po["kernel"].shape == (7, 7, 3, 16)
    np.testing.assert_array_equal(np.asarray(pd["kernel"]), np.asarray(po["kernel"]))
    np.testing.assert_array_equal(np.asarray(pd["bias"]), np.asarray(po["bias"]))


def test_env_gate(monkeypatch):
    from singlehdr_tpu.models.unet import _fused_unet_enabled

    monkeypatch.setenv("SINGLEHDR_FUSED_UNET", "0")
    assert not _fused_unet_enabled()
    monkeypatch.delenv("SINGLEHDR_FUSED_UNET", raising=False)
    assert _fused_unet_enabled()


def test_arena_budget_gate(monkeypatch):
    """_fused_prefix applies the U-Net's own measured arena budget; an
    explicit SINGLEHDR_FUSED_UNET=1 bypasses it (experiments only)."""
    from singlehdr_tpu.models import unet as u

    monkeypatch.delenv("SINGLEHDR_FUSED_UNET", raising=False)
    assert u._fused_unet_budget() == u._FUSED_UNET_BUDGET
    monkeypatch.setenv("SINGLEHDR_FUSED_UNET", "1")
    assert u._fused_unet_budget() is None
    monkeypatch.delenv("SINGLEHDR_FUSED_UNET", raising=False)

    # geometry-independent check of the prefix's budget clause: pretend the
    # kernel supports everything and the backend is TPU, then push the stem
    # load past the budget with a huge batch
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import singlehdr_tpu.ops.pallas.unet_stage_pallas as k

    monkeypatch.setattr(k, "supported", lambda *a, **kw: True)
    net = ResidualUNet()
    assert net._fused_prefix((4, 512, 512, 3)) > 0  # well under budget
    over_b = u._FUSED_UNET_BUDGET // (512 * 512 * net.stem_features) + 1
    assert net._fused_prefix((over_b, 512, 512, 3)) == 0
    monkeypatch.setenv("SINGLEHDR_FUSED_UNET", "1")
    assert net._fused_prefix((over_b, 512, 512, 3)) > 0  # explicit bypass


# ---------------------------------------------------------------------------
# Hardware parity (run on the TPU host; skipped in the CPU suite)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize(
    "kernel,cin,f,h,w",
    [(7, 3, 16, 64, 512), (5, 16, 32, 32, 256), (3, 32, 64, 32, 128)],
)
def test_kernel_matches_oracle_on_device(rng, kernel, cin, f, h, w):
    x = jnp.asarray(rng.rand(2, h, w, cin).astype(np.float32) - 0.5)
    wk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    w1, b1 = wk(kernel, kernel, cin, f), wk(f)
    w2, b2 = wk(kernel, kernel, f, f), wk(f)
    pooled, act = m.unet_stage2(x, w1, b1, w2, b2)
    pooled_o, act_o = m._xla_reference(x, w1, b1, w2, b2)
    # f32 matmuls under DEFAULT precision take different bf16-pass
    # decompositions in Mosaic vs XLA's conv expansion: ~3e-3 max element
    # diff measured on v5e.  Logic bugs (edge masks, halo rows) produce
    # O(activation) ~ 0.1-1 errors, far above this bound.
    np.testing.assert_allclose(
        np.asarray(act), np.asarray(jnp.transpose(act_o, (0, 3, 1, 2))),
        atol=1e-2, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(jnp.transpose(pooled_o, (0, 3, 1, 2))),
        atol=1e-2, rtol=1e-2,
    )


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel needs TPU")
def test_unet_fused_matches_dense_on_device(rng):
    """Full deq U-Net, fused chain vs SINGLEHDR_FUSED_UNET=0 dense path."""
    import os

    x = jnp.asarray(rng.rand(2, 512, 512, 3).astype(np.float32))
    net = ResidualUNet(dtype=jnp.bfloat16, fast_convs=False)
    v = net.init(jax.random.PRNGKey(0), x)
    fused = net.apply(v, x)
    os.environ["SINGLEHDR_FUSED_UNET"] = "0"
    try:
        dense = net.apply(v, x)
    finally:
        del os.environ["SINGLEHDR_FUSED_UNET"]
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(dense, np.float32),
        atol=5e-2, rtol=5e-2,  # bf16 accumulation-order noise through 5 scales
    )


@pytest.mark.skipif(not ON_TPU, reason="Mosaic kernel needs TPU")
def test_hal_fused_chain_matches_dense_on_device(rng, monkeypatch):
    """Full HallucinationNet, fused enc chain w/ in-kernel NHWC skips vs dense.

    Pins the round-5 skip emission: fused stages transpose their skip on the
    MXU before the HBM write, so the decoder consumes NHWC directly and no
    NCHW twin or boundary copy ever exists (the +6 GiB arena that blocked
    the fused chain at large batch, BENCH_NOTES r3-r5).  Tolerance matches
    the per-kernel device oracle: f32 matmuls under DEFAULT precision take
    different bf16-pass decompositions in Mosaic vs XLA's conv expansion.
    monkeypatch (not direct os.environ writes) so a raise in either apply
    can't leak the env var into later tests (ADVICE r4)."""
    from singlehdr_tpu.models import HallucinationNet

    x = jnp.asarray(rng.rand(2, 64, 128, 3).astype(np.float32))
    net = HallucinationNet(dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x[:1])
    monkeypatch.setenv("SINGLEHDR_FUSED_ENC", "1")
    fused = jax.jit(lambda v, x: net.apply(v, x))(v, x)
    monkeypatch.setenv("SINGLEHDR_FUSED_ENC", "0")
    dense = jax.jit(lambda v, x: net.apply(v, x))(v, x)
    monkeypatch.delenv("SINGLEHDR_FUSED_ENC")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), atol=1e-2, rtol=1e-2,
    )
