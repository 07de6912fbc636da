"""TF1 checkpoint importer (train/tf1_import.py): the reference's
tf.variable_scope namespace must map 1:1 onto the Flax parameter tree for
every shipped variant, round-tripping values exactly (torch/TF-free —
synthetic TF-layout dicts, the approach of tests/test_resnet.py)."""

import numpy as np
import pytest

import jax

from mac_network_tpu.models import MACNetwork
from mac_network_tpu.train.tf1_import import (
    EMA_SUFFIX, import_tf1_params, load_tf1_npz, tf1_name_map)
from tests.test_model import (VARIANTS, make_embedding_init, make_inputs,
                              small_cfg)


def _build_params(cfg):
    emb = make_embedding_init(cfg)
    qs, lengths, images, _ = make_inputs()
    model = MACNetwork(cfg, emb)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images)
    return model, variables


def _fake_tf_ckpt(cfg, params):
    """Synthetic TF1-layout checkpoint holding the model's own values —
    so a correct import reproduces the tree bit-for-bit."""
    from mac_network_tpu.train.tf1_import import _flatten
    name_map = tf1_name_map(cfg)
    flat = _flatten(params)
    path_to_tf = {path: tf for tf, path in name_map.items()}
    tf_vars = {}
    for path, leaf in flat.items():
        assert path in path_to_tf, f"no TF1 name for {'/'.join(path)}"
        tf_vars[path_to_tf[path]] = np.asarray(leaf)
    return tf_vars


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_roundtrip_all_variants(variant):
    cfg = small_cfg(**VARIANTS[variant])
    _, variables = _build_params(cfg)
    params = variables["params"]

    tf_vars = _fake_tf_ckpt(cfg, params)           # also asserts coverage
    imported = import_tf1_params(cfg, tf_vars, params)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(imported)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_imported_params_produce_identical_logits():
    cfg = small_cfg(**VARIANTS["args"])
    model, variables = _build_params(cfg)
    qs, lengths, images, _ = make_inputs()
    tf_vars = _fake_tf_ckpt(cfg, variables["params"])
    imported = import_tf1_params(cfg, tf_vars, variables["params"])
    logits_a, _ = model.apply(variables, qs, lengths, images, train=False)
    logits_b, _ = model.apply({"params": jax.tree.map(np.asarray, imported)},
                              qs, lengths, images, train=False)
    np.testing.assert_array_equal(np.asarray(logits_a), np.asarray(logits_b))


def test_extended_flags_covered():
    """Optional branches beyond the shipped files: unshared cells, write
    gate, answer embeddings (BOTH), initKBwithQ, null word."""
    flags = dict(VARIANTS["args4"], unsharedCells=True,
                 controlInputUnshared=False, ansEmbMod="BOTH",
                 answerMod="MUL", initKBwithQ="CNCT", addNullWord=True)
    cfg = small_cfg(**flags)
    _, variables = _build_params(cfg)
    params = variables["params"]
    tf_vars = _fake_tf_ckpt(cfg, params)
    # unshared cells produce per-step reference scopes control0/read0/...
    assert any("/read2/" in n or "read2/" in n for n in tf_vars), \
        sorted(tf_vars)[:5]
    imported = import_tf1_params(cfg, tf_vars, params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(imported)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), b)


def test_ema_shadow_variables():
    """ema=True reads <name>/ExponentialMovingAverage, the reference's EMA
    saver namespace (model.py:658-667)."""
    cfg = small_cfg(**VARIANTS["args"])
    _, variables = _build_params(cfg)
    params = variables["params"]
    tf_vars = _fake_tf_ckpt(cfg, params)
    shadow = {k + EMA_SUFFIX: v * 0.5 for k, v in tf_vars.items()}
    both = {**tf_vars, **shadow}
    raw = import_tf1_params(cfg, both, params)
    ema = import_tf1_params(cfg, both, params, ema=True)
    for (_, r), (_, e) in zip(jax.tree_util.tree_leaves_with_path(raw),
                              jax.tree_util.tree_leaves_with_path(ema)):
        np.testing.assert_allclose(e, np.asarray(r) * 0.5, rtol=1e-6)


def test_shape_mismatch_raises():
    cfg = small_cfg(**VARIANTS["args"])
    _, variables = _build_params(cfg)
    params = variables["params"]
    tf_vars = _fake_tf_ckpt(cfg, params)
    name = "macModel/qEmbeddings/emb"
    tf_vars[name] = tf_vars[name][:, :-1]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_tf1_params(cfg, tf_vars, params)


def test_unmapped_checkpoint_variable_raises():
    cfg = small_cfg(**VARIANTS["args"])
    _, variables = _build_params(cfg)
    params = variables["params"]
    tf_vars = _fake_tf_ckpt(cfg, params)
    tf_vars["macModel/somethingElse/weights/weight"] = np.zeros((3, 3))
    with pytest.raises(ValueError, match="unmapped"):
        import_tf1_params(cfg, tf_vars, params)
    # optimizer slots are fine to leave behind
    del tf_vars["macModel/somethingElse/weights/weight"]
    tf_vars["macModel/qEmbeddings/emb/Adam"] = np.zeros((2, 2))
    tf_vars["beta1_power"] = np.zeros(())
    import_tf1_params(cfg, tf_vars, params)


def test_npz_roundtrip(tmp_path):
    cfg = small_cfg(**VARIANTS["args"])
    _, variables = _build_params(cfg)
    tf_vars = _fake_tf_ckpt(cfg, variables["params"])
    path = str(tmp_path / "ckpt.npz")
    np.savez(path, **tf_vars)
    loaded = load_tf1_npz(path)
    assert set(loaded) == set(tf_vars)
    imported = import_tf1_params(cfg, loaded, variables["params"])
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(imported)):
        np.testing.assert_array_equal(np.asarray(a), b)
