"""Log-domain tonemaps used by the HDR losses.

  * ``mu_tonemap``: log(1 + 10x)/log(11) — the compression applied before every
    Hallucination/Refinement loss and the VGG perceptual features
    (train.py:219-226, joint_training.py:166-174, finetune_real_dataset.py:169-174).
  * ``hdr_log_compression`` / ``hdr_log_decompression``: the validDR=5000 pair
    defined in tf_utils.py:113-131 (present in the reference's op library though
    unused by its drivers; kept for API completeness).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# pure-Python so importing this module never touches a device backend
_LOG11 = math.log(11.0)


def mu_tonemap(x: jnp.ndarray, mu: float = 10.0) -> jnp.ndarray:
    """log(1 + mu*x) / log(1 + mu)."""
    return jnp.log1p(mu * x) * (1.0 / jnp.log1p(jnp.asarray(mu, x.dtype)))


def hdr_log_compression(x: jnp.ndarray, valid_dr: float = 5000.0) -> jnp.ndarray:
    """log(1 + validDR*x)/log(1 + validDR) - 1 (tf_utils.py:113-121)."""
    return jnp.log1p(valid_dr * x) / jnp.log1p(jnp.asarray(valid_dr, x.dtype)) - 1.0


def hdr_log_decompression(x: jnp.ndarray, valid_dr: float = 5000.0) -> jnp.ndarray:
    """Inverse of hdr_log_compression (tf_utils.py:123-131)."""
    y = (x + 1.0) * jnp.log1p(jnp.asarray(valid_dr, x.dtype))
    return jnp.exp(y) / valid_dr
