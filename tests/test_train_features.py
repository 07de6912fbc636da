"""Training-feature tests: variable-subset training, EMA semantics,
LR-plateau heuristic, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mac_network_tpu.config import Config
from mac_network_tpu.train.driver import improve_enough
from tests.test_parallel import tiny_cfg, make_batch, build


def test_train_subset_freezes_other_params():
    cfg = tiny_cfg(trainSubset=True, varSubset=["stem"])
    model, state, step, batch = build(cfg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, batch, 0.01, jax.random.key(0))
    p1 = jax.tree.map(np.asarray, state.params)
    # stem params moved
    stem_moved = np.abs(
        p1["stem"]["cnn"]["cnn_0"]["conv"]["kernel"]
        - p0["stem"]["cnn"]["cnn_0"]["conv"]["kernel"]).max()
    assert stem_moved > 0
    # encoder params frozen
    enc0 = p0["qEmbeddings"]["rnn0"]["fw"]["scan"]["cell"]["kernel_w"]
    enc1 = p1["qEmbeddings"]["rnn0"]["fw"]["scan"]["cell"]["kernel_w"]
    np.testing.assert_array_equal(enc0, enc1)


def test_ema_tracks_params():
    cfg = tiny_cfg(useEMA=True, emaDecayRate=0.5)
    model, state, step, batch = build(cfg)
    for _ in range(3):
        state, _ = step(state, batch, 0.01, jax.random.key(0))
    # EMA lags but differs from both init and current params
    p = np.asarray(state.params["mac"]["qInputU"]["weight"])
    e = np.asarray(state.ema_params["mac"]["qInputU"]["weight"])
    assert np.abs(p - e).max() > 0
    # eval_params respects the flag
    assert state.eval_params(True) is state.ema_params
    assert state.eval_params(False) is state.params


def test_improve_enough_heuristic():
    prior = {"prev": {"res": {"train": {"loss": 0.40}}}}
    # big improvement -> keep lr
    curr = {"res": {"train": {"loss": 0.30}}}
    assert improve_enough(curr, prior, lr=1e-4)
    # tiny improvement at low loss and high lr -> decay
    prior = {"prev": {"res": {"train": {"loss": 0.40}}}}
    curr = {"res": {"train": {"loss": 0.395}}}
    assert not improve_enough(curr, prior, lr=1e-4)
    # first epoch: no prior
    assert improve_enough(curr, {"prev": {"res": None}}, lr=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from mac_network_tpu.train.checkpoint import (
        save_checkpoint, restore_checkpoint, latest_epoch)
    cfg = tiny_cfg(useEMA=True)
    cfg.expName = "ckpt"
    cfg.weightsPath = str(tmp_path)
    cfg.weightsToKeep = 2
    model, state, step, batch = build(cfg)
    state, _ = step(state, batch, 0.01, jax.random.key(0))
    for epoch in (1, 2, 3):
        save_checkpoint(cfg, state, epoch, extra={"lr": cfg.lr})
    assert latest_epoch(cfg) == 3
    import os
    assert not os.path.exists(cfg.weightsFile(1))   # pruned (keep 2)

    model2, state2, step2, _ = build(cfg)
    restored = restore_checkpoint(cfg, state2, 3)
    a = np.asarray(state.params["mac"]["qInputU"]["weight"])
    b = np.asarray(restored.params["mac"]["qInputU"]["weight"])
    np.testing.assert_array_equal(a, b)
    assert int(restored.step) == int(state.step)
    # Adam moments survive
    ref_mu = jax.tree.leaves(state.opt_state)[0]
    got_mu = jax.tree.leaves(restored.opt_state)[0]
    np.testing.assert_array_equal(np.asarray(ref_mu), np.asarray(got_mu))


def test_print_analysis(capsys):
    from mac_network_tpu.train.logging import print_analysis
    cfg = Config()
    cfg.analysisType = "arity"
    res = {"preds": [
        {"programSeq": ["0_scene_scene_", "1_count_count_"],
         "questionSeq": ["a"], "answer": "1", "prediction": "1"},
        {"programSeq": ["2_equal_size_"],
         "questionSeq": ["b"], "answer": "no", "prediction": "yes"},
    ]}
    print_analysis(cfg, res)
    out = capsys.readouterr().out
    assert "Analysis by arity" in out
    assert "Group 1" in out and "Group 2" in out

    cfg.analysisType = "questionLength"
    print_analysis(cfg, res)
    assert "Analysis by questionLength" in capsys.readouterr().out
