"""Reference-checkpoint compatibility: real key inventory + channel order.

``ref_inventory`` lists every variable key/shape of the reference's
checkpoints, hand-derived from the reference model sources (independently of
``weight_import.NET_MAPS``).  These tests write full TensorBundle checkpoints
from that inventory and require ``import_net_weights`` to consume them with
**zero** parameters left at their init values — so a wrong attribute name in
either the inventory or the maps fails loudly — and validate the BGR->RGB
channel-order adapter by exact behavioral equivariance.
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
from singlehdr_tpu.train import ref_inventory, tensorbundle
from singlehdr_tpu.train.weight_import import (
    adapt_channel_order,
    export_reference_checkpoint,
    import_net_weights,
    reference_keys_to_tree,
)

KEY = jax.random.PRNGKey(0)


def _module(net):
    return {
        "deq": DequantizationNet(fast_convs=False),
        "ref": RefinementNet(fast_convs=False),
        "lin": LinearizationNet(),
        "hal": HallucinationNet(),
    }[net]


def _sample(net):
    rng = np.random.RandomState(1)
    c = 9 if net == "ref" else 3
    return jnp.asarray(rng.rand(1, 64, 64, c), jnp.float32)


def _init(net):
    return _module(net).init(KEY, _sample(net))


def _n_leaves(tree):
    return len(jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("net", ["deq", "ref", "lin", "hal"])
def test_full_fixture_imports_with_zero_kept(net, tmp_path):
    """Every model variable must be fed by the reference checkpoint keys."""
    prefix = str(tmp_path / f"{net}-ckpt-1")
    tensorbundle.write_bundle(prefix, ref_inventory.make_fixture_tensors(net))
    target = _init(net)
    out = import_net_weights(net, prefix, target)
    stats = out.pop("_import_stats")
    assert stats["kept"] == 0, f"{net}: unmapped variables remained at init"
    # hal's preproc_mean is a framework-only constant carried from the
    # target (reference checkpoints cannot provide it) — every other leaf
    # must be checkpoint-fed
    assert stats["imported"] == _n_leaves(target) - stats.get("carried", 0)
    assert stats.get("carried", 0) == (1 if net == "hal" else 0)
    # the imported net must run
    y = _module(net).apply(out, _sample(net))
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("net", ["deq", "ref", "lin", "hal"])
def test_import_skips_optimizer_and_counters(net, tmp_path):
    tensors = ref_inventory.make_fixture_tensors(net)
    n_model = len(
        [k for k in ref_inventory.checkpoint_keys(net) if k.startswith("lin/")
         and ref_inventory.SLOT_INFIX not in k]
    )
    tree = reference_keys_to_tree(net, tensors)
    assert _n_leaves(tree) == n_model


@pytest.mark.parametrize("net", ["deq", "ref", "lin", "hal"])
def test_inventory_shapes_match_model(net):
    """Inventory shapes (hand-derived from the reference) == our model's."""
    target = _init(net)
    tree = reference_keys_to_tree(
        net,
        {k: np.zeros(s, np.float32)
         for k, s in ref_inventory.checkpoint_keys(net, with_optimizer=False).items()},
    )
    flat_t = [
        (p, l) for p, l in jax.tree_util.tree_leaves_with_path(target)
        # hal's preprocessing-mean constant is framework-only (not a
        # reference variable; defaulted at import)
        if "preproc_mean" not in jax.tree_util.keystr(p)
    ]
    flat_i = dict(jax.tree_util.tree_leaves_with_path(tree))
    assert len(flat_t) == len(flat_i)
    for path, leaf in flat_t:
        assert path in flat_i, f"missing {jax.tree_util.keystr(path)}"
        assert flat_i[path].shape == leaf.shape, jax.tree_util.keystr(path)


@pytest.mark.parametrize("net", ["deq", "ref", "lin", "hal"])
def test_export_reference_checkpoint_roundtrip(net, tmp_path):
    """Our variables -> reference-format bundle -> import == identity."""
    target = _init(net)
    prefix = str(tmp_path / f"{net}-export-1")
    n = export_reference_checkpoint(net, jax.device_get(target), prefix)
    assert n > 2
    # exported keys must be a subset of the hand-derived reference inventory
    # (plus the object-graph proto every genuine TF2 checkpoint carries,
    # which the inventory of *variable* keys deliberately excludes)
    inventory = set(ref_inventory.checkpoint_keys(net, with_optimizer=False))
    written = set(tensorbundle.BundleReader(prefix).keys())
    assert written - {"_CHECKPOINTABLE_OBJECT_GRAPH"} <= inventory
    back = import_net_weights(net, prefix, target)
    stats = back.pop("_import_stats")
    assert stats["kept"] == 0
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(target),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# channel-order adapter: exact behavioral equivariance
# ---------------------------------------------------------------------------


def _mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _mutable(v) for k, v in tree.items()}
    return np.asarray(jax.device_get(tree))


def _flip3(x):
    return x[..., ::-1]


def _flip9(x):
    return jnp.concatenate(
        [x[..., 2::-1], x[..., 5:2:-1], x[..., 8:5:-1]], axis=-1
    )


def test_channel_adapter_deq():
    """deq'(x) == flip(deq(flip(x))): BGR weights become RGB weights."""
    mod = _module("deq")
    x = _sample("deq")
    v = _init("deq")
    adapted = adapt_channel_order("deq", _mutable(v))
    got = mod.apply(adapted, x)
    want = _flip3(mod.apply(v, _flip3(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_channel_adapter_ref():
    mod = _module("ref")
    x = _sample("ref")
    v = _init("ref")
    adapted = adapt_channel_order("ref", _mutable(v))
    got = mod.apply(adapted, x)
    want = _flip3(mod.apply(v, _flip9(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_channel_adapter_lin():
    """lin'(x) == lin(flip(x)): the curve output has no channel order."""
    mod = _module("lin")
    x = _sample("lin")
    v = _init("lin")
    adapted = adapt_channel_order("lin", _mutable(v))
    got = mod.apply(adapted, x)
    want = mod.apply(v, _flip3(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_channel_adapter_hal():
    """hal'(x) == flip(hal(flip(x))), incl. the VGG-mean bias correction."""
    mod = _module("hal")
    x = _sample("hal")
    v = _init("hal")
    adapted = adapt_channel_order("hal", _mutable(v))
    got = mod.apply(adapted, x)
    want = _flip3(mod.apply(v, _flip3(x)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-5
    )


@pytest.mark.parametrize("net", ["deq", "ref", "lin", "hal"])
def test_vendored_index_matches_inventory(net):
    """The committed binary .index fixtures stay in sync with the inventory.

    Provenance: these fixtures were produced by this repo's own writer
    (tensorbundle.write_bundle over ref_inventory-shaped zeros), so alone they
    guard regressions, not TF compatibility (ADVICE r2).  The non-circular
    anchors are tests/test_tf_parity.py, which verifies the reader byte-exact
    against tf.train.load_checkpoint on genuine TF-written bundles and the
    writer against TF2's object-based restore, plus the hand-assembled byte
    tests in test_tensorbundle.py."""
    import os

    prefix = os.path.join(
        os.path.dirname(__file__), "golden", "ref_index", net
    )
    got = tensorbundle.BundleReader(prefix).variable_to_shape_map()
    want = ref_inventory.checkpoint_keys(net)
    assert set(got) == set(want)
    for k, s in want.items():
        assert got[k] == s, k


def test_import_with_channel_order_bgr(tmp_path):
    """End-to-end: bundle -> import(channel_order='bgr') equals adapted."""
    net = "deq"
    prefix = str(tmp_path / "bgr-ckpt-1")
    tensorbundle.write_bundle(prefix, ref_inventory.make_fixture_tensors(net))
    target = _init(net)
    plain = import_net_weights(net, prefix, target)
    plain.pop("_import_stats")
    swapped = import_net_weights(net, prefix, target, channel_order="bgr")
    swapped.pop("_import_stats")
    x = _sample(net)
    mod = _module(net)
    got = mod.apply(swapped, x)
    want = _flip3(mod.apply(plain, _flip3(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
