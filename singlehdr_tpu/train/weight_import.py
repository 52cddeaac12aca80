"""Import reference (TF2-Keras) checkpoint weights into this framework's trees.

The reference saves each net with ``tf.train.Checkpoint(epoch, lin=model,
optimizer=...)`` — the model slot is literally named ``lin`` for every net
(tf_utils.py:157-160) — so variable keys look like

    lin/conv1/kernel/.ATTRIBUTES/VARIABLE_VALUE
    lin/crf_feature_net/res1/norm1/moving_mean/.ATTRIBUTES/VARIABLE_VALUE

This module maps those Keras attribute paths onto this framework's Flax param
trees per net.  Loading backends:

  * a dict of {key: np.ndarray} (e.g. produced by
    ``tools/dump_tf_checkpoint.py`` on a machine with TF installed, saved as
    .npz), or
  * tf.train.load_checkpoint when TensorFlow happens to be importable.

Layout notes: Keras Conv2D kernels are HWIO and Dense kernels are [in, out] —
identical to Flax, so arrays transfer without transposition.  Keras
BatchNormalization gamma/beta map to Flax scale/bias (params) and
moving_mean/moving_variance to batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"

# Conv/Dense parameter names are shared by TF-Keras and Flax.
_CONV = {"kernel": ("params", "kernel"), "bias": ("params", "bias")}
_BN = {
    "gamma": ("params", "scale"),
    "beta": ("params", "bias"),
    "moving_mean": ("batch_stats", "mean"),
    "moving_variance": ("batch_stats", "var"),
}

# ---------------------------------------------------------------------------
# per-net attribute-path -> flax-module-path maps
# ---------------------------------------------------------------------------

# Dequantization / Refinement U-Net (dequantization_net.py:31-47,
# refinement_net.py:31-47): attribute names conv1/conv2/d2..d4/enc/u4..u1/out.
_UNET_MAP = {
    "conv1": "unet/stem1",
    "conv2": "unet/stem2",
    "d2": "unet/down2",
    "d3": "unet/down3",
    "d4": "unet/down4",
    "enc": "unet/bottleneck",
    "u4": "unet/up4",
    "u3": "unet/up3",
    "u2": "unet/up2",
    "u1": "unet/up1",
    "out": "unet/head",
}

# Bottleneck residual blocks (linearization_net.py:6-83): projection blocks
# (type1) name their shortcut conv1/norm1 and main path conv2..4/norm2..4;
# identity blocks (type2) use conv1..3/norm1..3.
_RES_T1 = {
    "conv1": "proj_conv",
    "norm1": "proj_bn",
    "conv2": "conv1",
    "norm2": "bn1",
    "conv3": "conv2",
    "norm3": "bn2",
    "conv4": "conv3",
    "norm4": "bn3",
}
_RES_T2 = {
    "conv1": "conv1",
    "norm1": "bn1",
    "conv2": "conv2",
    "norm2": "bn2",
    "conv3": "conv3",
    "norm3": "bn3",
}

_LIN_MAP: Dict[str, str] = {
    "crf_feature_net/conv1": "crf_feature_net/stem",
    "crf_feature_net/norm1": "crf_feature_net/stem_bn",
    "ae_invcrf_decode_net/fc": "pca_head",
}
for _blk, _tmap in (
    ("res1", _RES_T1),
    ("res2", _RES_T2),
    ("res3", _RES_T2),
    ("res4", _RES_T1),
    ("res5", _RES_T2),
):
    for _src, _dst in _tmap.items():
        _LIN_MAP[f"crf_feature_net/{_blk}/{_src}"] = (
            f"crf_feature_net/{_blk}/{_dst}"
        )

# Hallucination-Net (hallucination_net.py:109-145): encoder d1..d5, latent
# conv1/norm1, decoder u5..u1 (conv1/norm1) with skip fusions s5..s1, head
# conv2/norm2, final skip s0.
_HAL_MAP: Dict[str, str] = {"conv1": "latent_conv", "norm1": "latent_bn",
                            "conv2": "head_conv", "norm2": "head_bn",
                            "s0/conv1": "skip0/conv"}
for _i in range(1, 6):
    for _c in ("conv1", "conv2", "conv3"):
        _HAL_MAP[f"d{_i}/{_c}"] = f"enc{_i}/{_c}"
    _HAL_MAP[f"u{_i}/conv1"] = f"dec{_i}/conv"
    _HAL_MAP[f"u{_i}/norm1"] = f"dec{_i}/bn"
    _HAL_MAP[f"u{_i}/conv2"] = f"dec{_i}/conv2_unused"  # dead layer in the ref
    _HAL_MAP[f"s{_i}/conv1"] = f"skip{_i}/conv"

NET_MAPS: Dict[str, Mapping[str, str]] = {
    "deq": _UNET_MAP,
    "ref": _UNET_MAP,
    "lin": _LIN_MAP,
    "hal": _HAL_MAP,
}


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def reference_keys_to_tree(
    net: str, raw: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    """Map a reference checkpoint's {key: array} dict onto flax variable trees.

    Returns {"params": ..., "batch_stats": ...} for the given net
    ('deq'/'lin'/'hal'/'ref').  Unknown keys (optimizer slots, epoch counters,
    the hal decoder's dead conv2 layer) are skipped.
    """
    net_map = NET_MAPS[net]
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, value in raw.items():
        if not key.endswith(_SUFFIX):
            continue
        path = key[: -len(_SUFFIX)]
        parts = path.split("/")
        if parts[0] != "lin":  # the universal model-slot name (tf_utils.py:159)
            continue
        parts = parts[1:]
        if len(parts) < 2:
            continue
        var_name = parts[-1]
        attr_path = "/".join(parts[:-1])
        # try longest-prefix match in the net map
        if attr_path in net_map:
            module_path = net_map[attr_path]
        else:
            # two-level attributes like d2/conv1 for the U-Nets
            head, _, tail = attr_path.partition("/")
            if head in net_map and tail:
                module_path = f"{net_map[head]}/{tail}"
            else:
                continue
        if "unused" in module_path:
            continue
        var_map = _BN if var_name in _BN else _CONV
        if var_name not in var_map:
            continue
        collection, flax_name = var_map[var_name]
        _set_path(
            out[collection],
            tuple(module_path.split("/")) + (flax_name,),
            np.asarray(value),
        )
    return out


# ---------------------------------------------------------------------------
# consolidated deployment weights: one flat .npz for the whole pipeline
# ---------------------------------------------------------------------------


def _flatten_tree(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, Mapping):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_variables_npz(variables: Mapping[str, Any], path: str) -> int:
    """Write {params, batch_stats} as one flat compressed npz.

    Keys are collection-prefixed slash paths (``params/deq/unet/stem1/kernel``),
    portable across machines without orbax/sharding metadata — the deployment
    artifact for inference and serving.
    """
    flat = {}
    for collection in ("params", "batch_stats"):
        flat.update(
            _flatten_tree(variables.get(collection, {}), collection)
        )
    np.savez_compressed(path, **flat)
    return len(flat)


def load_variables_npz(path: str) -> Dict[str, Any]:
    """Inverse of save_variables_npz -> {"params": ..., "batch_stats": ...}."""
    z = np.load(path)
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key in z.files:
        collection, _, rest = key.partition("/")
        _set_path(out[collection], tuple(rest.split("/")), z[key])
    return out


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read {key: array} from an .npz dump or a TF checkpoint prefix."""
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=False)
        return {k: z[k] for k in z.files}
    try:
        import tensorflow as tf  # pragma: no cover — TF not in this image
    except ImportError as e:
        raise RuntimeError(
            "reading raw TF checkpoints requires tensorflow; dump the "
            "checkpoint to .npz with tools/dump_tf_checkpoint.py on a "
            "machine that has TF installed"
        ) from e
    reader = tf.train.load_checkpoint(path)  # pragma: no cover
    return {  # pragma: no cover
        k: reader.get_tensor(k)
        for k in reader.get_variable_to_shape_map()
    }


def import_net_weights(net: str, path: str, target_variables: Mapping[str, Any]):
    """Import reference weights for one net, validated against a target tree.

    Args:
      net: 'deq' | 'lin' | 'hal' | 'ref'.
      path: .npz dump (or TF checkpoint prefix when TF is available).
      target_variables: the flax variables of a freshly-initialized net —
        defines the expected structure/shapes.

    Returns: {"params": ..., "batch_stats": ...} with imported arrays where
    the checkpoint provided them and target values elsewhere; raises on any
    shape mismatch.
    """
    raw = load_reference_checkpoint(path)
    imported = reference_keys_to_tree(net, raw)

    stats = {"imported": 0, "kept": 0}

    def merge(target: Any, src: Any, crumb: str = ""):
        if not isinstance(target, Mapping):
            if src is None:
                stats["kept"] += 1
                return target
            if tuple(np.shape(src)) != tuple(np.shape(target)):
                raise ValueError(
                    f"shape mismatch at {crumb}: checkpoint "
                    f"{np.shape(src)} vs model {np.shape(target)}"
                )
            stats["imported"] += 1
            return np.asarray(src, np.float32)
        return {
            k: merge(v, src.get(k) if isinstance(src, Mapping) else None, f"{crumb}/{k}")
            for k, v in target.items()
        }

    out = {
        "params": merge(target_variables["params"], imported["params"]),
        "batch_stats": merge(
            target_variables.get("batch_stats", {}), imported["batch_stats"]
        ),
    }
    out["_import_stats"] = dict(stats)
    return out
