"""Sobel edge maps matching tf.image.sobel_edges semantics.

tf.image.sobel_edges REFLECT-pads by 1 pixel and correlates each channel with

    dy = [[-1,-2,-1],           dx = [[-1, 0, 1],
          [ 0, 0, 0],                 [-2, 0, 2],
          [ 1, 0, 1]]  (row diff)     [-1, 0, 1]]  (col diff)

returning [b,h,w,c,2] with the last axis ordered (dy, dx); the Linearization-Net
then reshapes to [b,h,w,2c] (linearization_net.py:312-314), giving channel order
(c0_dy, c0_dx, c1_dy, c1_dx, ...).

Implemented as separable shift-adds on the reflect-padded array — pure VPU work
that XLA fuses with the surrounding feature-stack concat, with no conv dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp


def sobel_edges(img: jnp.ndarray) -> jnp.ndarray:
    """[b,h,w,c] -> [b,h,w,2c] interleaved (dy, dx) per channel."""
    b, h, w, c = img.shape
    xp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # smooth along W: [1,2,1], then difference along H: [-1,0,1]
    sw = xp[:, :, :w] + 2.0 * xp[:, :, 1 : w + 1] + xp[:, :, 2 : w + 2]  # [b,h+2,w,c]
    dy = sw[:, 2 : h + 2] - sw[:, :h]
    # smooth along H, difference along W
    sh = xp[:, :h] + 2.0 * xp[:, 1 : h + 1] + xp[:, 2 : h + 2]           # [b,h,w+2,c]
    dx = sh[:, :, 2 : w + 2] - sh[:, :, :w]
    return jnp.stack([dy, dx], axis=-1).reshape(b, h, w, 2 * c)
