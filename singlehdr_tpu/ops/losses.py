"""Loss primitives with the reference's reduction semantics.

The reference backpropagates through *unreduced* loss tensors (per-sample
[b,1,1,1] maps, or the full elementwise map in the finetune driver); TensorFlow's
``tape.gradient`` implicitly differentiates the SUM of a non-scalar target.  To
keep training dynamics identical, every helper here returns the unreduced
per-sample tensor and ``scalar_from_per_sample`` applies the faithful sum
reduction (a ``mean`` option is provided for conventional use).
"""

from __future__ import annotations

import jax.numpy as jnp

from singlehdr_tpu.ops.tonemap import mu_tonemap


def masked_l2(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-sample mean squared error [b,1,1,1], optionally masked.

    Mirrors get_l2_loss_with_mask + mask multiply (tf_utils.py:110-111,
    train.py:170-171)."""
    loss = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3), keepdims=True)
    return loss if mask is None else loss * mask


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-sample mean absolute error [b,1,1,1], optionally masked."""
    loss = jnp.mean(jnp.abs(pred - target), axis=(1, 2, 3), keepdims=True)
    return loss if mask is None else loss * mask


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total-variation of [b,h,w,c], scalar.

    Matches the reference's symmetric-pad-then-diff form (train.py:229-236):
    the pad duplicates the last row/column so the final difference is zero but
    still counted in the mean — i.e. mean over h (resp. w) terms of which one is
    zero.  Implemented directly on the diffs with the same denominator.
    """
    b, h, w, c = x.shape
    dx = jnp.sum(jnp.abs(x[:, 1:] - x[:, :-1])) / (b * h * w * c)
    dy = jnp.sum(jnp.abs(x[:, :, 1:] - x[:, :, :-1])) / (b * h * w * c)
    return dx + dy


def perceptual_l1(feats_a, feats_b) -> jnp.ndarray:
    """Sum of per-sample L1 distances over feature tuples -> [b,1,1,1].

    The reference sums mean-|.| over VGG pool1..3 (train.py:221-223)."""
    total = 0.0
    for fa, fb in zip(feats_a, feats_b):
        total = total + jnp.mean(jnp.abs(fa - fb), axis=(1, 2, 3), keepdims=True)
    return total


def hallucination_loss(
    y: jnp.ndarray,
    target: jnp.ndarray,
    vgg_apply,
    mask: jnp.ndarray | None,
    perceptual_weight: float = 0.001,
    tv_weight: float = 0.1,
) -> jnp.ndarray:
    """L1 + perceptual + TV in the mu-tonemapped domain -> per-sample [b,1,1,1].

    Matches train.py:219-238 / joint_training.py:166-182: both operands are
    mu-tonemapped; VGG features are computed on the tonemapped images; the TV
    term is a scalar broadcast into every sample's loss before masking.
    """
    y_g = mu_tonemap(y)
    t_g = mu_tonemap(target)
    l1 = jnp.mean(jnp.abs(y_g - t_g), axis=(1, 2, 3), keepdims=True)
    perc = perceptual_l1(vgg_apply(y_g), vgg_apply(t_g))
    tv = tv_loss(y_g)
    loss = l1 + perceptual_weight * perc + tv_weight * tv
    return loss if mask is None else loss * mask


def scalar_from_per_sample(loss: jnp.ndarray, reduction: str = "sum") -> jnp.ndarray:
    """Reduce an unreduced loss tensor to the scalar actually differentiated.

    "sum" reproduces TF tape.gradient semantics on non-scalar targets (the
    reference's effective objective); "mean" is the conventional alternative.
    """
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    raise ValueError(f"unknown reduction {reduction!r}")
