"""--hbmData device-resident feature cache (data/loader.py
HBMFeatureCache): one sequential upload of a tier's feature table into
device memory, per-batch on-device gather by imageIds.

The cache must be a pure transport optimization — training and eval
through it are numerically identical to the streaming path (the
reference re-feeds every batch's features through feed_dict,
main.py:256-260; we keep that as the streaming path and add the cache on
top).  Covers: train-epoch equivalence, eval-preds equivalence with a
ragged tail, the GQA object-features layout, the budget/auto gate, and
cross-epoch cache reuse."""

import os

import numpy as np
import pytest

import jax

from mac_network_tpu.config import Config, load_dataset_config
from mac_network_tpu.data import Preprocesser
from mac_network_tpu.data.loader import (HBMFeatureCache, ImageLoader,
                                         resolve_hbm_cache)
from mac_network_tpu.data.synthetic import write_synthetic_dataset

H = W = 5
C = 16


def make_cfg(root, **overrides):
    cfg = Config()
    cfg.expName = "hbmtest"
    cfg.dataset = "CLEVR"
    cfg.dataBasedir = str(root)
    cfg.wrdEmbRandom = True
    cfg.wrdEmbUniform = True
    cfg.encBi = True
    cfg.outQuestion = True
    cfg.controlContextual = True
    cfg.controlInputUnshared = True
    cfg.readProjInputs = True
    cfg.readMemConcatKB = True
    cfg.readMemConcatProj = True
    cfg.readMemProj = True
    cfg.readCtrl = True
    cfg.writeMemProj = True
    cfg.initCtrl = "Q"
    cfg.useEMA = True
    cfg.clipGradients = True
    cfg.wrdEmbDim = 16
    cfg.encDim = cfg.ctrlDim = cfg.memDim = cfg.attDim = cfg.stemDim = 32
    cfg.netLength = 2
    cfg.outClassifierDims = [32]
    cfg.batchSize = 16
    cfg.lr = 3e-3
    cfg.weightsPath = str(root / "w")
    cfg.predsPath = str(root / "p")
    cfg.logPath = str(root / "r")
    cfg.configPath = str(root / "r")
    for k, v in overrides.items():
        setattr(cfg, k, v)
    load_dataset_config(cfg)
    cfg.dataPath = os.path.join(str(root), "CLEVR_v1", "data")
    cfg.imageDims = [H, W, C]
    return cfg


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hbm_clevr")
    # 40 train rows -> a ragged 8-row tail batch at batchSize 16
    write_synthetic_dataset(str(root), n_train=40, n_val=24, n_test=8,
                            dims=(C, H, W))
    return root


def _run_one_epoch(root, hbm_mode, train=True, get_preds=False,
                   epochs=1, **overrides):
    from main import build_state_and_runner
    import random as _random
    _random.seed(0)                 # the CLI seeds the global RNGs once
    np.random.seed(0)               # (main.py); this harness bypasses it
    cfg = make_cfg(root, hbmData=hbm_mode, **overrides)
    pp = Preprocesser(cfg)
    data, emb, adict = pp.preprocessData()
    _, state, runner, _ = build_state_and_runner(cfg, emb, adict)
    rng = jax.random.key(0)
    tier = data["main"]["train" if train else "val"]
    res = None
    for epoch in range(1, epochs + 1):
        state, res = runner.run_epoch(state, tier, train=train, epoch=epoch,
                                      rng=rng, get_preds=get_preds)
    return cfg, state, res, runner


def test_train_epoch_matches_streaming(dataset_root):
    """A cached train epoch produces bit-identical parameters to the
    streaming path (same seed, same batch order, f32)."""
    _, st_off, res_off, _ = _run_one_epoch(dataset_root, "off")
    _, st_on, res_on, runner = _run_one_epoch(dataset_root, "on")
    assert runner._hbm_caches, "hbmData=on must build a cache"
    assert np.isclose(res_off["loss"], res_on["loss"], rtol=0, atol=0)
    p_off = jax.tree_util.tree_leaves(st_off.params)
    p_on = jax.tree_util.tree_leaves(st_on.params)
    for a, b in zip(p_off, p_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_preds_match_streaming_with_ragged_tail(dataset_root):
    """Eval through the cache (including the padded tail batch's repeated
    last-row gather) yields the same predictions as streaming."""
    _, _, res_off, _ = _run_one_epoch(dataset_root, "off", train=False,
                                      get_preds=True)
    _, _, res_on, _ = _run_one_epoch(dataset_root, "on", train=False,
                                     get_preds=True)
    assert len(res_off["preds"]) == len(res_on["preds"]) > 0
    for a, b in zip(res_off["preds"], res_on["preds"]):
        assert a["prediction"] == b["prediction"]
        assert a["index"] == b["index"]


def test_bfloat16_cache_matches_streaming(dataset_root):
    """computeDtype=bfloat16: the device-side cast in the cache build
    matches the streaming path's host-side ml_dtypes cast (both
    round-to-nearest-even)."""
    _, _, res_off, _ = _run_one_epoch(dataset_root, "off", train=False,
                                      get_preds=True,
                                      computeDtype="bfloat16")
    _, _, res_on, _ = _run_one_epoch(dataset_root, "on", train=False,
                                     get_preds=True,
                                     computeDtype="bfloat16")
    for a, b in zip(res_off["preds"], res_on["preds"]):
        assert a["prediction"] == b["prediction"]


def test_gather_matches_load_batch_layout(dataset_root):
    """Unit: cache.gather == load_batch + transpose + cast, in the
    model's [B, H, W, C] layout, for an arbitrary id order."""
    import jax.numpy as jnp
    cfg = make_cfg(dataset_root)
    pp = Preprocesser(cfg)
    data, _, _ = pp.preprocessData()
    tier = data["main"]["train"]
    loader = ImageLoader(tier["images"], cfg)
    loader.open()
    try:
        cache = HBMFeatureCache(loader, cfg)
        cache.build()
        ids = [3, 0, 7, 3, 11, 5, 2, 9]
        want = loader.load_batch({"imageIds": ids})
        got = np.asarray(cache.gather(ids, batch_size=len(ids)))
        np.testing.assert_array_equal(got, want.astype(got.dtype))
        # ragged: batch_size > len(ids) pads by repeating the last row
        got_pad = np.asarray(cache.gather(ids, batch_size=len(ids) + 3))
        np.testing.assert_array_equal(got_pad[:len(ids)], got)
        for r in range(len(ids), len(ids) + 3):
            np.testing.assert_array_equal(got_pad[r], got[-1])
    finally:
        loader.close()


def test_gqa_objects_gather(tmp_path):
    """GQA object features ([N, slots, dim] h5 rows) cache into the same
    [B, 1, slots, dim] grid layout load_batch produces."""
    from mac_network_tpu.data.synthetic import write_synthetic_gqa
    from tests.test_gqa import gqa_cfg
    root = tmp_path / "gqa_hbm"
    root.mkdir()
    write_synthetic_gqa(str(root), n_train=24, n_val=8)
    cfg = gqa_cfg(root)
    pp = Preprocesser(cfg)
    data, _, _ = pp.preprocessData()
    tier = data["main"]["train"]
    loader = ImageLoader(tier["images"], cfg)
    loader.open()
    try:
        cache = HBMFeatureCache(loader, cfg)
        cache.build()
        ids = tier["data"][0]["imageIds"][:6]
        want = loader.load_batch({"imageIds": ids})
        got = np.asarray(cache.gather(ids, batch_size=len(ids)))
        assert got.shape == want.shape  # [B, 1, slots, dim]
        np.testing.assert_array_equal(got, want.astype(got.dtype))
    finally:
        loader.close()


def test_auto_budget_gate(dataset_root):
    """hbmData=auto builds the cache only within the hbmDataGB budget;
    the budget covers the TOTAL across cached tiers; multi-host and
    hbmData=off disable it."""
    cfg = make_cfg(dataset_root)
    pp = Preprocesser(cfg)
    data, _, _ = pp.preprocessData()
    loader = ImageLoader(data["main"]["train"]["images"], cfg)
    loader.open()
    try:
        table_gb = HBMFeatureCache.table_bytes(loader, cfg) / 1e9
        caches = {}
        cfg.hbmData = "auto"
        cfg.hbmDataGB = table_gb / 2          # table over budget -> no cache
        assert resolve_hbm_cache(caches, loader, cfg) is None
        assert not caches
        cfg.hbmDataGB = table_gb * 4          # fits -> builds + registers
        c = resolve_hbm_cache(caches, loader, cfg)
        assert c is not None and caches[loader.filename] is c
        # same tier again: reused, not rebuilt
        assert resolve_hbm_cache(caches, loader, cfg) is c
        cfg.hbmData = "off"
        assert resolve_hbm_cache({}, loader, cfg) is None
        cfg.hbmData = "on"
        assert resolve_hbm_cache({}, loader, cfg, process_count=2) is None
    finally:
        loader.close()


def test_cache_reused_across_epochs(dataset_root):
    """The Runner's per-tier cache persists across epochs: one build, two
    epochs (the whole point — one upload per run)."""
    _, _, _, runner = _run_one_epoch(dataset_root, "on", epochs=2)
    assert len(runner._hbm_caches) == 1


def test_cache_composes_with_steps_per_dispatch(dataset_root):
    """--hbmData x --stepsPerDispatch: the chunked lax.scan dispatch
    gathers its [K, B, ...] image stack from the cache and matches the
    streaming chunked run exactly."""
    kw = dict(stepsPerDispatch=2, trainedNum=32)  # 2 full chunks, no tail
    _, st_off, _, _ = _run_one_epoch(dataset_root, "off", **kw)
    _, st_on, _, _ = _run_one_epoch(dataset_root, "on", **kw)
    for a, b in zip(jax.tree_util.tree_leaves(st_off.params),
                    jax.tree_util.tree_leaves(st_on.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_composes_with_mesh(dataset_root):
    """--hbmData x --meshData: gathered features are re-placed onto the
    mesh's data axis (image_put) and the sharded run matches streaming."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    kw = dict(meshData=2)
    _, st_off, res_off, _ = _run_one_epoch(dataset_root, "off", **kw)
    _, st_on, res_on, _ = _run_one_epoch(dataset_root, "on", **kw)
    assert np.isclose(res_off["loss"], res_on["loss"], rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(st_off.params),
                    jax.tree_util.tree_leaves(st_on.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
