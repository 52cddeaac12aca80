"""Shared residual U-Net backbone for the Dequantization and Refinement nets.

Both nets share one topology (dequantization_net.py:31-65,
refinement_net.py:31-66): a 7x7 stem at 16 channels, four avg-pool down stages
(the last being the bottleneck), bilinear-x2 up stages with skip concats, and a
3-channel 3x3 head; they differ only in bottleneck width (256 vs 128) and the
output/residual transform, which the thin wrappers own.

TPU notes: all convs are SAME/NHWC so XLA tiles them directly onto the MXU.
The 3-32 channel stages underfill the MXU's 128 output lanes, so with
``fast_convs`` (default) every conv routes through PackedConv, which packs
horizontally-adjacent pixels into the lane dim (ops.packed_conv) — pure XLA,
training-safe, checkpoint-identical parameters, automatic dense fallback for
the wide stages and off-TPU.  The bilinear x2 is a fixed-weight lerp that
fuses into the following conv's input; avg-pool is a reshape-mean (no
reduce_window dispatch).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from singlehdr_tpu.models.layers import (
    PackedConv,
    UpsampleConv,
    conv,
    glorot,
    leaky_relu,
)
from singlehdr_tpu.ops.resize import avg_pool_2x2, resize_bilinear_x2


def _fused_unet_enabled() -> bool:
    import os

    return os.environ.get("SINGLEHDR_FUSED_UNET", "1") == "1"


# U-Net's own fused-stage budget (decoupled from hallucination's constant,
# whose semantics moved to whole-pipeline HBM fit with the in-kernel NHWC
# skip emission).  1.4e9 is the value the round-4 U-Net A/B was measured
# under (BENCH_NOTES r4 "fused U-Net encoder A/B"): the full 3-stage prefix
# engages at every batch tried — per-stage loads b*h*w*f <= 5.4e8 at
# b128 @ 512^2 — with an XLA temp arena IDENTICAL to dense at b128
# (delta 0.00 GiB) and +1.4 GiB at b32, both measured via
# tools/memory_report.py.  That arena measurement is also why the U-Net's
# boundary transposes (see __call__) carry no optimization_barrier: the
# second-layout-twin hazard the hal encoder hit does not manifest at the
# U-Net's narrow skip widths (16-64 ch), where the NHWC copies are small
# relative to the conv tensors XLA already materializes.
_FUSED_UNET_BUDGET = 1_400_000_000


def _fused_unet_budget():
    """Per-stage arena budget for the fused U-Net encoder, or None.

    Mirrors hallucination._fused_enc_allowed: SINGLEHDR_FUSED_UNET=1 set
    EXPLICITLY bypasses the budget (experiments — the caller owns the HBM
    risk); unset applies the measured budget above.  =0 is handled by
    _fused_unet_enabled."""
    import os

    if os.environ.get("SINGLEHDR_FUSED_UNET") == "1":
        return None
    return _FUSED_UNET_BUDGET


class _ConvParams(nn.Module):
    """Owns an nn.Conv-compatible (kernel, bias) pair without computing the
    conv — the fused encoder kernel (ops.pallas.unet_stage_pallas) consumes
    the raw weights.  Param names/shapes/initializers match ``layers.conv``
    exactly, so the fused and dense paths share one checkpoint layout."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel", glorot(),
            (self.kernel, self.kernel, cin, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _StageParams(nn.Module):
    """conv1+conv2 param owner named like DownStage, for the fused path."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, cin: int):
        p1 = _ConvParams(self.features, self.kernel, name="conv1")(cin)
        p2 = _ConvParams(self.features, self.kernel, name="conv2")(self.features)
        return p1, p2


def _stage_conv(features, kernel, act, dtype, fast_convs, name):
    """One SAME conv + activation; packed-lane fast path when enabled."""
    if fast_convs:
        return PackedConv(features, (kernel, kernel), act=act, dtype=dtype, name=name)
    mod = conv(features, kernel, dtype=dtype, name=name)
    if act is None:
        return mod
    assert act == "leaky_relu"
    return lambda x: leaky_relu(mod(x))


class DownStage(nn.Module):
    """avg-pool /2 then two leaky-ReLU convs (dequantization_net.py:4-15)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32
    fast_convs: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_pooled: bool = False) -> jnp.ndarray:
        if not pre_pooled:
            x = avg_pool_2x2(x)
        for name in ("conv1", "conv2"):
            x = _stage_conv(
                self.features, self.kernel, "leaky_relu", self.dtype,
                self.fast_convs, name,
            )(x)
        return x


class UpStage(nn.Module):
    """bilinear x2, conv, skip-concat, conv (dequantization_net.py:17-29).

    On the dense path the resize+conv1 pair runs as the fused low-res conv +
    depth-to-space (UpsampleConv — exact, checkpoint-identical params); the
    packed fast path keeps resize + PackedConv, which wins at those shapes.
    """

    features: int
    dtype: Any = jnp.float32
    fast_convs: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        if self.fast_convs:
            x = resize_bilinear_x2(x)
            x = self._conv("conv1")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            return self._conv("conv2")(x)
        x = UpsampleConv(
            self.features, act="leaky_relu", dtype=self.dtype, name="conv1"
        )(x)
        # conv2 over concat(x, skip) computed as two SAME convs summed: the
        # concat form writes+reads a [., 2F] tensor (2.1 GiB at up4's
        # b128 @ 512^2) purely to feed a conv whose input-channel dim splits.
        # Params (kernel [3,3,cx+cy,f] via _ConvParams) are identical to the
        # concat conv, so checkpoints interchange.
        cx = x.shape[-1]
        k, b = _ConvParams(self.features, 3, name="conv2")(cx + skip.shape[-1])
        dn = ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            x, k[:, :, :cx].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=dn,
        )
        out = out + jax.lax.conv_general_dilated(
            skip.astype(x.dtype), k[:, :, cx:].astype(x.dtype), (1, 1),
            "SAME", dimension_numbers=dn,
        )
        return leaky_relu(out + b.astype(out.dtype))

    def _conv(self, name: str):
        return _stage_conv(
            self.features, 3, "leaky_relu", self.dtype, self.fast_convs, name
        )


class ResidualUNet(nn.Module):
    """The shared encoder-decoder; returns the raw 3-channel head output.

    Spatial dims must be multiples of 16 (four /2 stages).
    """

    stem_features: int = 16
    stem_kernel: int = 7
    down_features: Sequence[int] = (32, 64, 128)
    down_kernels: Sequence[int] = (5, 3, 3)
    bottleneck_features: int = 256
    out_features: int = 3
    dtype: Any = jnp.float32
    # packed-lane conv fast path (ops.packed_conv): pure XLA, differentiable,
    # parameter-identical to the dense path; dense fallback off-TPU
    fast_convs: bool = True

    # Packing trades MAC inflation for lane occupancy; measured on v5e it wins
    # for small/medium workloads (b16 @ 512^2: deq 48.7 vs 60.6 ms/net) but
    # loses at large ones (b64 @ 512^2: 162.6 vs 154.7 ms), where XLA's dense
    # conv blocks well enough that the inflated FLOPs dominate.  Shapes are
    # static under jit, so every compiled shape picks its winning path.
    max_pack_pixels: int = 16 * 512 * 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fast = (
            self.fast_convs
            and x.shape[0] * x.shape[1] * x.shape[2] <= self.max_pack_pixels
        )
        x = x.astype(self.dtype)
        # Eval-mode fused channels-major encoder chain (ops.pallas.
        # unet_stage_pallas): the dense NHWC form lane-pads the C=3-32 stages
        # 8-42x; the fused stages chain NCHW with no padded tensor ever
        # materialized.  Parameters are identical between the paths.  The
        # packed regime (small workloads) keeps the packed convs, which
        # already fix the underfill there.
        n_fused = 0 if (train or fast) else self._fused_prefix(x.shape)
        if n_fused:
            from singlehdr_tpu.ops.pallas.unet_stage_pallas import unet_stage2

            k1, b1 = _ConvParams(
                self.stem_features, self.stem_kernel, name="stem1"
            )(x.shape[-1])
            k2, b2 = _ConvParams(
                self.stem_features, self.stem_kernel, name="stem2"
            )(self.stem_features)
            h, a = unet_stage2(
                x, k1.astype(self.dtype), b1, k2.astype(self.dtype), b2
            )
            skips = [a]
            for i in range(n_fused - 1):
                f, k = self.down_features[i], self.down_kernels[i]
                (k1, b1), (k2, b2) = _StageParams(f, k, name=f"down{i + 2}")(
                    h.shape[1]
                )
                h, a = unet_stage2(
                    h, k1.astype(self.dtype), b1, k2.astype(self.dtype), b2,
                    nchw_in=True,
                )
                skips.append(a)
            # boundary: the dense remainder and the decoder are NHWC
            h = jnp.transpose(h, (0, 2, 3, 1))
            skips = [jnp.transpose(s, (0, 2, 3, 1)) for s in skips]
        else:
            h = self._stem("stem1", fast)(x)
            h = self._stem("stem2", fast)(h)
            skips = [h]
        for i, (f, k) in enumerate(zip(self.down_features, self.down_kernels)):
            if i < n_fused - 1:
                continue  # stage already fused above
            h = DownStage(
                f, k, dtype=self.dtype, fast_convs=fast,
                name=f"down{i + 2}",
            )(h, pre_pooled=(n_fused > 0 and i == n_fused - 1))
            skips.append(h)
        h = DownStage(
            self.bottleneck_features, 3, dtype=self.dtype,
            fast_convs=fast, name="bottleneck",
        )(h, pre_pooled=(n_fused == len(self.down_features) + 1))
        up_widths = [self.stem_features, *self.down_features][::-1]  # e.g. [128,64,32,16]
        # The decoder stays dense in the large-batch eval regime: packing the
        # narrow UpStages was measured a LOSS at b128 @ 512^2 both wholesale
        # (resize + packed convs: 101.5 vs 125.5 img/s) and conv2-only
        # (115.2) — BENCH_NOTES round-4 "packed-lane decoder".
        for i, (f, skip) in enumerate(zip(up_widths, reversed(skips))):
            h = UpStage(
                f, dtype=self.dtype, fast_convs=fast,
                name=f"up{len(skips) - i}",
            )(h, skip)
        return self._head(fast)(h)

    def _fused_prefix(self, shape) -> int:
        """Longest kernelizable prefix of encoder stages (stems, down2, ...).

        Each stage needs W % 128 / H % 16 at its own scale, so the prefix
        shrinks as the spatial dims halve (at 512^2: stems + down2 + down3;
        the 64^2-and-below stages stay dense — C >= 128 there no longer
        lane-pads)."""
        if jax.default_backend() != "tpu" or not _fused_unet_enabled():
            return 0
        from singlehdr_tpu.ops.pallas.unet_stage_pallas import supported

        budget = _fused_unet_budget()
        fits = lambda load: budget is None or load <= budget
        b, h, w, _ = shape
        if not supported(shape, self.stem_kernel, self.stem_features) or not fits(
            b * h * w * self.stem_features
        ):
            return 0
        n, ch = 1, self.stem_features
        h, w = h // 2, w // 2
        for f, k in zip(self.down_features, self.down_kernels):
            if not supported((b, ch, h, w), k, f, nchw=True) or not fits(
                b * h * w * f
            ):
                break
            n, ch, h, w = n + 1, f, h // 2, w // 2
        return n

    def _stem(self, name: str, fast: bool):
        """Stem conv + leaky ReLU; packed-lane kernel on the fast path."""
        return _stage_conv(
            self.stem_features, self.stem_kernel, "leaky_relu", self.dtype,
            fast, name,
        )

    def _head(self, fast: bool):
        """Raw 3-channel output conv (activation belongs to the wrappers)."""
        return _stage_conv(
            self.out_features, 3, None, self.dtype, fast, "head"
        )
