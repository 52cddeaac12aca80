"""Weight-import mapping tests.

Round-trip: build a reference-style checkpoint key dict from a freshly
initialized net by inverting the attribute map, then import it and require
(a) exact array equality and (b) completeness — every model parameter must be
covered by the mapping (nothing silently left at init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
)
from singlehdr_tpu.train.weight_import import (
    NET_MAPS,
    _SUFFIX,
    reference_keys_to_tree,
    import_net_weights,
)

NETS = {
    "deq": (DequantizationNet, (1, 32, 32, 3)),
    "lin": (LinearizationNet, (1, 32, 32, 3)),
    "hal": (HallucinationNet, (1, 32, 32, 3)),
    "ref": (RefinementNet, (1, 32, 32, 9)),
}


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _invert_module_path(net_map, module_path_parts):
    """flax module path -> reference keras attribute path."""
    rev = {v: k for k, v in net_map.items()}
    full = "/".join(module_path_parts)
    if full in rev:
        return rev[full]
    parent = "/".join(module_path_parts[:-1])
    if parent in rev:
        return f"{rev[parent]}/{module_path_parts[-1]}"
    raise KeyError(f"no reference attribute for module path {full!r}")


def _make_reference_raw(net, variables):
    """Synthesize the reference checkpoint key dict for a variables tree."""
    net_map = NET_MAPS[net]
    raw = {}
    params = _flatten(variables["params"])
    for path, arr in params.items():
        *mod, var = path
        attr = _invert_module_path(net_map, mod)
        # distinguish conv bias from BN beta via sibling names
        siblings = {p[-1] for p in params if p[:-1] == tuple(mod)}
        if var == "kernel":
            name = "kernel"
        elif var == "bias" and "kernel" in siblings:
            name = "bias"
        elif var == "bias":
            name = "beta"
        elif var == "scale":
            name = "gamma"
        else:
            raise AssertionError(var)
        raw[f"lin/{attr}/{name}{_SUFFIX}"] = arr
    for path, arr in _flatten(variables.get("batch_stats", {})).items():
        *mod, var = path
        if var == "preproc_mean":
            continue  # framework-only constant, absent from reference ckpts
        attr = _invert_module_path(net_map, mod)
        name = {"mean": "moving_mean", "var": "moving_variance"}[var]
        raw[f"lin/{attr}/{name}{_SUFFIX}"] = arr
    # noise the importer must skip: optimizer slots + epoch counter
    raw["epoch/.ATTRIBUTES/VARIABLE_VALUE"] = np.zeros(())
    raw["optimizer/iter/.ATTRIBUTES/VARIABLE_VALUE"] = np.zeros(())
    return raw


@pytest.mark.parametrize("net", list(NETS))
def test_roundtrip_import_is_exact_and_complete(net, tmp_path):
    cls, shape = NETS[net]
    variables = cls().init(jax.random.PRNGKey(0), jnp.zeros(shape))
    raw = _make_reference_raw(net, variables)

    npz = str(tmp_path / f"{net}.npz")
    np.savez_compressed(npz, **raw)

    out = import_net_weights(net, npz, variables)
    stats = out.pop("_import_stats")
    n_params = len(_flatten(variables["params"])) + len(
        _flatten(variables.get("batch_stats", {}))
    )
    assert (
        stats["imported"] == n_params - stats.get("carried", 0)
    ), f"mapping gaps: {stats}"
    assert stats["kept"] == 0

    for (pa, a), (pb, b) in zip(
        sorted(_flatten(out["params"]).items()),
        sorted(_flatten(variables["params"]).items()),
    ):
        assert pa == pb
        np.testing.assert_array_equal(a, np.asarray(b))


def test_import_detects_shape_mismatch(tmp_path):
    variables = DequantizationNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    raw = _make_reference_raw("deq", variables)
    key = next(k for k in raw if k.endswith("kernel" + _SUFFIX))
    raw[key] = np.zeros((1, 1, 1, 1), np.float32)
    npz = str(tmp_path / "bad.npz")
    np.savez_compressed(npz, **raw)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_net_weights("deq", npz, variables)


def test_unknown_keys_are_skipped():
    tree = reference_keys_to_tree(
        "deq",
        {
            "lin/u4/conv2_of_wrong_name/kernel" + _SUFFIX: np.zeros((3, 3, 1, 1)),
            "optimizer/beta_1" + _SUFFIX: np.zeros(()),
            "save_counter" + _SUFFIX: np.zeros(()),
        },
    )
    assert tree["params"] == {} or "u4" not in str(tree["params"])
