"""Frozen VGG16 feature extractor for the perceptual loss.

The reference loads a ``vgg16.npy`` weight dict and freezes conv1_1..conv3_3 as
graph constants, returning (pool1, pool2, pool3) on a VGG-preprocessed input
(vgg16.py:56-134; conv4/5 are dead code there).  Here the weights are a plain
pytree of arrays closed over by a pure function — they are constants, never
touched by optimizers, and XLA constant-folds/bf16-casts them freely.

``load_vgg16_params`` reads the same npy dict layout when a file is available;
otherwise it produces a deterministic He-init surrogate (seed 42) so the
perceptual loss remains a valid random-features distance — weight-import from
the official ``vgg16.npy`` restores exact parity (SURVEY.md §7.3).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.ops.color import vgg_preprocess
from singlehdr_tpu.ops.resize import max_pool

# (name, in_ch, out_ch) for the three stages used by the perceptual loss.
_LAYERS = (
    ("conv1_1", 3, 64),
    ("conv1_2", 64, 64),
    ("conv2_1", 64, 128),
    ("conv2_2", 128, 128),
    ("conv3_1", 128, 256),
    ("conv3_2", 256, 256),
    ("conv3_3", 256, 256),
)

Params = Dict[str, Tuple[np.ndarray, np.ndarray]]


def load_vgg16_params(npy_path: str | None = None) -> Params:
    """Load {name: (kernel HWIO, bias)} from a vgg16.npy dict, or He-init."""
    if npy_path and os.path.exists(npy_path):
        raw = np.load(npy_path, encoding="latin1", allow_pickle=True).item()
        return {
            name: (
                np.asarray(raw[name][0], np.float32),
                np.asarray(raw[name][1], np.float32),
            )
            for name, _, _ in _LAYERS
        }
    rng = np.random.RandomState(42)
    params: Params = {}
    for name, cin, cout in _LAYERS:
        std = np.sqrt(2.0 / (3 * 3 * cin))
        params[name] = (
            (rng.randn(3, 3, cin, cout) * std).astype(np.float32),
            np.zeros((cout,), np.float32),
        )
    return params


def _conv_relu(x: jnp.ndarray, kernel, bias) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel, x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(bias, x.dtype))


class Vgg16Features:
    """Callable frozen feature extractor: rgb01 [b,h,w,3] -> (pool1, pool2, pool3)."""

    def __init__(self, params: Params | None = None, npy_path: str | None = None, dtype=jnp.float32):
        self.params = params if params is not None else load_vgg16_params(npy_path)
        self.dtype = dtype

    def __call__(self, rgb01: jnp.ndarray):
        x = vgg_preprocess(rgb01).astype(self.dtype)
        p = self.params
        x = _conv_relu(x, *p["conv1_1"])
        x = _conv_relu(x, *p["conv1_2"])
        pool1 = max_pool(x, 2, 2, "SAME")
        x = _conv_relu(pool1, *p["conv2_1"])
        x = _conv_relu(x, *p["conv2_2"])
        pool2 = max_pool(x, 2, 2, "SAME")
        x = _conv_relu(pool2, *p["conv3_1"])
        x = _conv_relu(x, *p["conv3_2"])
        x = _conv_relu(x, *p["conv3_3"])
        pool3 = max_pool(x, 2, 2, "SAME")
        return pool1, pool2, pool3
