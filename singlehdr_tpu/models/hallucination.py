"""Hallucination-Net: recovers clipped highlights as a residual (BGR output).

An HDRCNN-style autoencoder (hallucination_net.py:109-190; Eilertsen et al.
SIGGRAPH Asia 2017 architecture): the input is VGG-preprocessed (x255, RGB->BGR,
mean subtract), encoded by a VGG16-layout conv stack (64/128/256/512/512 with
2-2-3-3-3 convs and 2x2 max-pools), a 3x3x512 latent conv + BN, and decoded by
bilinear-x2 up blocks with 1x1 skip fusions whose encoder skips are scaled by
1/255 (hallucination_net.py:101).  The final skip fuses the preprocessed BGR
input itself; output is ReLU'd and remains **BGR** — callers channel-swap
(train.py:216, joint_training.py:164, test_real_refinement.py:104).
~24.6M parameters.

The reference's decoder ``up`` block defines a second conv that is never called
(hallucination_net.py:83) — a dead layer, intentionally not reproduced.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from singlehdr_tpu.models.layers import UpsampleConv, batch_norm, conv
from singlehdr_tpu.ops.color import vgg_preprocess
from singlehdr_tpu.ops.resize import max_pool


class _ConvParams(nn.Module):
    """Owns an nn.Conv-compatible (kernel, bias) pair without computing the
    conv — the fused encoder kernel consumes the raw weights.  Param names,
    shapes, and initializers match ``layers.conv`` exactly, so the fused and
    dense paths share one checkpoint layout."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


# Fused-vs-dense crossover batch, expressed as a per-stage load (measured
# v5e 16 GiB @ 512^2 eval, 2026-08-20 — at other resolutions/HBM sizes the
# b*h*w*f proxy is only a proxy; re-measure before trusting it there).
# With the in-kernel NHWC skip emission plus the 1/255-fold into the
# skip-fusion kernels, arena no longer decides: the fused pipeline COMPILES
# at b128 (13.61 GiB temp vs dense's fit).  Speed does: the fused chain wins
# standalone at b <= 96 (hal b96: 363.3 vs 406.1 ms dense) but LOSES
# in-pipeline at b128 (131.9 vs 135.4 img/s with einsum fusions; dense
# with conv1x1 fusions is faster still at 143.0) — near HBM peak the fused
# chain's extra hpool/pad buffers cost more than its lane-packing saves.
# The cap below keeps fusion on through b120 and dense at b128+.
_FUSED_ARENA_BUDGET = 2_050_000_000


def _fused_enc_allowed(load: int) -> bool:
    """Arena half of the fused-encoder policy: SINGLEHDR_FUSED_ENC=0 forces
    the budget check off (dense everywhere), =1 bypasses it (experiments —
    the caller owns the HBM risk); unset applies the measured budget above.
    The env only overrides THIS check: the chain-from-stem condition in
    EncoderStage (fuse only at the 3-ch stem or when the input is already
    channels-major) is structural and always enforced — =1 cannot force a
    mid-chain (e.g. enc2-only) fusion, which measured a 2% loss at b128
    (BENCH_NOTES, ROADMAP #9)."""
    import os

    mode = os.environ.get("SINGLEHDR_FUSED_ENC")
    if mode is not None:
        return mode == "1"
    return load <= _FUSED_ARENA_BUDGET


class EncoderStage(nn.Module):
    """n_convs ReLU convs then 2x2/2 max-pool.

    Returns ``(pooled, skip, nchw)``: when ``nchw`` is True the POOLED output
    is [b, c, h, w] — the eval-mode fused Pallas pass
    (ops.pallas.enc_pool_pallas) keeps the encoder chain channels-major
    because the dense XLA form pads C=64 NHWC tensors 2x in the lane dim and
    materializes the conv1 activation (BENCH_NOTES r3).  The skip is ALWAYS
    NHWC: the fused kernel transposes it in-register on the MXU before the
    HBM write (nhwc_skip, ROADMAP #10(a)), so the decoder consumes it
    directly and an NCHW twin never exists — the +6 GiB two-layout arena
    that kept the fused chain from compiling at large batch (BENCH_NOTES
    r4) is structurally gone.  Training (and any unsupported shape/backend)
    uses the dense convs; parameters are identical between the paths."""

    features: int
    n_convs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, nchw: bool = False):
        from singlehdr_tpu.ops.pallas.enc_pool_pallas import (
            encoder_stage2,
            supported,
        )

        if nchw:
            b, _, h, w = x.shape
        else:
            b, h, w = x.shape[:3]
        # Fusion must CHAIN from the 3-channel stem: a mid-chain fused stage
        # whose input is still NHWC pays a full NCHW layout-entry transpose
        # that the kernel win doesn't cover (enc2-only at b128 @ 512^2
        # measured 122.9 vs 125.0 img/s dense, 2026-08-19 — ROADMAP #9
        # resolved).  So fuse only when the input is already channels-major
        # (upstream stage fused) or this is the stem (cin == 3, where the
        # lane-underfilled dense conv is the thing being fixed).
        cin_chain = nchw or x.shape[-1] == 3
        if (
            not train
            and self.n_convs == 2
            and cin_chain
            and _fused_enc_allowed(b * h * w * self.features)
            and jax.default_backend() == "tpu"
            and supported(x.shape, self.features, nchw=nchw)
        ):
            cin = x.shape[1] if nchw else x.shape[-1]
            k1, b1 = _ConvParams(self.features, name="conv1")(cin)
            k2, b2 = _ConvParams(self.features, name="conv2")(self.features)
            pooled, skip = encoder_stage2(
                x, k1.astype(self.dtype), b1, k2.astype(self.dtype), b2,
                nchw_in=nchw, nhwc_skip=True,
            )
            return pooled, skip, True
        if nchw:
            x = jnp.transpose(x, (0, 2, 3, 1))
        for i in range(self.n_convs):
            x = nn.relu(conv(self.features, 3, dtype=self.dtype, name=f"conv{i + 1}")(x))
        return max_pool(x, 2, 2, "SAME"), x, False


class DecoderStage(nn.Module):
    """bilinear x2 -> conv -> ReLU -> BN -> ReLU (hallucination_net.py:77-91).

    The resize+conv pair runs as one fused low-res conv + depth-to-space on
    TPU (models.layers.UpsampleConv; exact, checkpoint-identical params)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = UpsampleConv(self.features, act="relu", dtype=self.dtype, name="conv")(x)
        x = nn.relu(batch_norm(train, name="bn", dtype=self.dtype)(x))
        return x


class _NarrowConv1x1(nn.Module):
    """1x1 conv over concat(x, y) computed as broadcast multiply-adds.

    For few-channel tensors (the final skip: 6 -> 3), a real concat + conv
    materializes 3/6-channel tensors padded to the TPU's 128-lane tile —
    a 20-40x memory blowup at 512^2 batches.  The same contraction as
    elementwise ops fuses into one VPU pass.  Parameters ('kernel' HWIO over
    the concatenated input, 'bias') are identical to nn.Conv, so checkpoints
    interchange with the conv form.  ``nchw=True`` consumes/produces
    [b, c, h, w] (lane dim W — nothing pads).
    """

    features: int
    dtype: Any = jnp.float32
    nchw: bool = False
    y_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        caxis = 1 if self.nchw else -1
        cx, cy = x.shape[caxis], y.shape[caxis]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (1, 1, cx + cy, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # y's scale (the encoder skip's 1/255) folds into the [cy, f] kernel
        # rows in f32 — NOT into y itself: a per-element scale of the skip
        # materializes a full second copy of a GiB-scale tensor as its own
        # kLoop pass (HLO-verified at b64 @ 512^2, 2026-08-20).
        k = kernel[0, 0]
        ky = (k[cx:] * self.y_scale).astype(self.dtype)
        k = k.astype(self.dtype)
        x = x.astype(self.dtype)
        y = y.astype(self.dtype)
        if self.nchw:
            out = jnp.einsum("bihw,io->bohw", x, k[:cx])
            out = out + jnp.einsum("bihw,io->bohw", y, ky)
            return out + bias.astype(out.dtype)[None, :, None, None]
        out = (x[..., None] * k[:cx]).sum(-2)
        out = out + (y[..., None] * ky).sum(-2)
        return out + bias.astype(out.dtype)


class _HeadConvToNCHW(nn.Module):
    """1x1 conv reading NHWC, emitting NCHW — the few-channel head output
    then lives with W in the lane dim instead of 42x-padded 3-channel tiles.
    Parameters identical to nn.Conv (kernel [1,1,cin,cout], bias)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        out = jnp.einsum(
            "bhwc,co->bohw", x.astype(self.dtype), kernel[0, 0].astype(self.dtype)
        )
        return out + bias.astype(out.dtype)[None, :, None, None]


class _SplitConv1x1(nn.Module):
    """1x1 conv over concat(x, y) computed as two matmuls summed.

    The concat form materializes a [., 2C] tensor (a full extra HBM
    round-trip of both operands — ~4 GB at dec2's b64 @ 256^2 x 256ch)
    purely to feed a contraction XLA could split; the two-einsum form reads
    each operand once.  The skip's 1/255 scale folds into the [cy, f] kernel
    rows (``y_scale``) — scaling y itself materializes a full second copy of
    the GiB-scale skip as its own kLoop pass (HLO-verified at b64 @ 512^2,
    2026-08-20).  Parameters ('kernel' [1,1,cx+cy,f], 'bias') are identical
    to nn.Conv over the concat, so checkpoints interchange with the
    reference layout."""

    features: int
    dtype: Any = jnp.float32
    y_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        cx, cy = x.shape[-1], y.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (1, 1, cx + cy, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # Real 1x1 convs, NOT einsums: a dot lowers through a [BHW, C]
        # reshape whose row-major output layout mismatches what TPU layout
        # assignment picks for the neighboring conv operands ({3,0,2,1}),
        # inserting 2 GiB pad+copy pairs around every decoder stage.  The
        # conv form chains through conv layout assignment with no copies:
        # hal standalone b120 @ 512^2 measured 388.9 ms vs 495.6 einsum
        # (-21.5%), pipeline b128 945.0 -> 895.1 ms, joint train step
        # 148.2 -> 150.0 img/s (2026-08-20, BENCH_NOTES r5).
        k = kernel[0, 0]
        ky = (k[cx:] * self.y_scale).astype(self.dtype)
        kx = k[:cx].astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kx[None, None], (1, 1), "VALID",
            dimension_numbers=dn,
        )
        out = out + jax.lax.conv_general_dilated(
            y.astype(self.dtype), ky[None, None], (1, 1), "VALID",
            dimension_numbers=dn,
        )
        return out + bias.astype(out.dtype)


class SkipFusion(nn.Module):
    """concat(x, skip/255) then 1x1 conv (hallucination_net.py:93-107).

    ``nchw=True`` runs the narrow (few-channel) form on [b, c, h, w]."""

    features: int
    dtype: Any = jnp.float32
    nchw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        # The 1/255 lives in the conv's y-kernel rows, not on the skip
        # tensor — see _SplitConv1x1.y_scale.
        skip = skip.astype(x.dtype)
        caxis = 1 if self.nchw else -1
        if (x.shape[caxis] + skip.shape[caxis]) * self.features <= 64:
            return _NarrowConv1x1(
                self.features, dtype=self.dtype, nchw=self.nchw,
                y_scale=1.0 / 255.0, name="conv",
            )(x, skip)
        assert not self.nchw, "wide NCHW skip fusion unsupported"
        return _SplitConv1x1(
            self.features, dtype=self.dtype, y_scale=1.0 / 255.0, name="conv"
        )(x, skip)


_ENC = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HallucinationNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb01: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The preprocessing means live in a (non-trainable) variable so that
        # BGR-trained reference checkpoints — whose effective mean order is
        # reversed — import as a pure weight transform with no module flags
        # (train.weight_import.adapt_channel_order).
        from singlehdr_tpu.ops.color import VGG_MEAN_BGR

        mean = self.variable(
            "batch_stats", "preproc_mean",
            lambda: jnp.asarray(VGG_MEAN_BGR, jnp.float32),
        )
        bgr = vgg_preprocess(rgb01, mean.value).astype(self.dtype)

        x = bgr
        nchw = False
        skips = []
        for i, (f, n) in enumerate(_ENC):
            x, s, nchw = EncoderStage(f, n, dtype=self.dtype, name=f"enc{i + 1}")(
                x, train, nchw
            )
            skips.append(s)  # always NHWC (fused stages transpose in-kernel)
        if nchw:
            x = jnp.transpose(x, (0, 2, 3, 1))

        x = conv(512, 3, dtype=self.dtype, name="latent_conv")(x)
        x = nn.relu(batch_norm(train, name="latent_bn", dtype=self.dtype)(x))

        # NOTE: a fused Pallas decoder (composite upsample-conv + BN + skip
        # fusion + 3-channel tail chained channels-major, git history
        # 4dc5c17..431170e) was built and measured AGAINST this dense path
        # and lost end-to-end at every geometry tried (b64 @ 512^2 bf16:
        # 278.8 ms full suffix / 274.3 ms tail-only vs 260.5 ms dense) —
        # the 2x2 phase-layout conversion of the wide skip/output tensors
        # costs ~35 ms per 2.1 GB on v5e in XLA or in-kernel, which no
        # fusion saving amortizes.  Measurements in BENCH_NOTES.md; the
        # dense path below (fused upsample-conv + _SplitConv1x1 + NCHW
        # tail) is the winner.
        for i, skip in zip(range(len(_ENC), 0, -1), reversed(skips)):
            f = _ENC[i - 1][0]
            x = DecoderStage(f, dtype=self.dtype, name=f"dec{i}")(x, train)
            x = SkipFusion(f, dtype=self.dtype, name=f"skip{i}")(x, skip)

        # 3-channel tail in NCHW: NHWC would carry every [.,3] tensor padded
        # to 128 lanes through head_conv/BN/skip0 (~4 GB each at b64 @ 512^2)
        x = _HeadConvToNCHW(3, dtype=self.dtype, name="head_conv")(x)
        x = nn.relu(batch_norm(train, name="head_bn", axis=1, dtype=self.dtype)(x))
        x = SkipFusion(3, dtype=self.dtype, nchw=True, name="skip0")(
            x, jnp.transpose(bgr, (0, 3, 1, 2))
        )
        x = jnp.transpose(nn.relu(x), (0, 2, 3, 1))
        return x.astype(jnp.float32)  # BGR residual
