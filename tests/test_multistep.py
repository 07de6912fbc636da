"""--stepsPerDispatch: K optimizer steps per device dispatch via lax.scan
(train/steps.py make_train_multistep).  The scan body folds the rng with
state.step, so K scanned steps must be numerically identical to K
sequential single-step calls — params, EMA, opt state and per-batch
metrics.  Plus a full CLI run through the chunked driver loop
(driver.py Runner._run_chunked)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mac_network_tpu.train import (
    create_train_state, make_optimizer, make_train_step)
from mac_network_tpu.train.steps import make_train_multistep
from tests.test_parallel import tiny_cfg, make_batch, build


def test_multistep_matches_sequential():
    """One K=4 scan dispatch == 4 sequential single steps, with dropout
    enabled (the rng fold-in must advance identically through the scan)."""
    cfg = tiny_cfg(memoryDropout=0.85, readDropout=0.85, qDropout=0.92,
                   readVariationalDropout=True)
    model, state_a, step, _ = build(cfg)
    _, state_b, _, _ = build(cfg)          # same seeds -> same init
    multistep = make_train_multistep(model, cfg, make_optimizer(cfg))

    batches = [make_batch(cfg, seed=s) for s in range(4)]
    rng = jax.random.key(11)

    losses_seq = []
    for b in batches:
        state_a, m = step(state_a, {k: jnp.asarray(v) for k, v in b.items()},
                          cfg.lr, rng)
        losses_seq.append(float(m["loss"]))

    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    state_b, metrics = multistep(state_b, stacked, cfg.lr, rng)

    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(losses_seq), rtol=1e-5)
    assert int(state_b.step) == int(state_a.step) == 4
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_b.params)):
        # atol floor: scan vs unrolled compile to different fusion
        # orders, so near-zero params see ~1e-6 accumulation noise
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pa)}")
    for va, vb in zip(jax.tree_util.tree_leaves(state_a.ema_params),
                      jax.tree_util.tree_leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-4, atol=1e-5)


def test_multistep_sharded():
    """The scan dispatch composes with the DP mesh: stacked batches
    sharded P(None, 'data') produce the same losses as unsharded."""
    from mac_network_tpu.parallel import make_mesh, shard_batch_stacked
    assert jax.device_count() >= 8
    cfg = tiny_cfg()
    model, state, _, _ = build(cfg)
    multistep = make_train_multistep(model, cfg, make_optimizer(cfg))
    batches = [make_batch(cfg, seed=s) for s in range(2)]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    rng = jax.random.key(11)
    _, m_plain = multistep(state, jax.tree.map(jnp.asarray, stacked),
                           cfg.lr, rng)

    cfg_dp = tiny_cfg(meshData=8)
    mesh = make_mesh(cfg_dp)
    model_dp, state_dp, _, _ = build(cfg_dp, mesh)
    multistep_dp = make_train_multistep(model_dp, cfg_dp,
                                        make_optimizer(cfg_dp))
    _, m_dp = multistep_dp(state_dp, shard_batch_stacked(stacked, mesh),
                           cfg_dp.lr, rng)
    np.testing.assert_allclose(np.asarray(m_dp["loss"]),
                               np.asarray(m_plain["loss"]), rtol=1e-4)


def test_multistep_composes_with_fused_train():
    """lax.scan over the custom-VJP fused training recurrence
    (--stepsPerDispatch + --fusedTrain): the Pallas fwd/bwd pair must
    trace under scan and match sequential fused steps."""
    from mac_network_tpu.ops.pallas import (
        FusedTrainEngine, supports_fused_train)
    from tests.test_pallas import fused_cfg, make_model_batch

    cfg = fused_cfg()
    for k in ("encInputDropout", "stemDropout", "qDropout", "memoryDropout",
              "readDropout", "writeDropout", "outputDropout"):
        setattr(cfg, k, 1.0)
    cfg.memoryVariationalDropout = False
    assert supports_fused_train(cfg)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 8)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)
    tx = make_optimizer(cfg)
    step = make_train_step(engine, cfg, tx)
    multistep = make_train_multistep(engine, cfg, tx)
    batch = {"questions": qs, "questionLengths": lens, "images": imgs,
             "answers": jnp.zeros((8,), jnp.int32),
             "mask": jnp.ones((8,), jnp.float32)}
    rng = jax.random.key(3)

    st_a = create_train_state(
        cfg, {"params": jax.tree.map(jnp.array, variables["params"])}, tx)
    losses = []
    for _ in range(2):
        st_a, m = step(st_a, batch, cfg.lr, rng)
        losses.append(float(m["loss"]))

    st_b = create_train_state(
        cfg, {"params": jax.tree.map(jnp.array, variables["params"])}, tx)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
    st_b, metrics = multistep(st_b, stacked, cfg.lr, rng)
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(losses), rtol=1e-5)


def test_chunked_loop_flush_paths():
    """Driver _run_chunked edge cases with stub step functions: bucket
    shape changes flush partial chunks through the single-step path, full
    chunks go through the scan path, the ragged epoch tail drains, and
    every batch is drained exactly once in order."""
    from mac_network_tpu.train.driver import Runner

    cfg = tiny_cfg()
    cfg.stepsPerDispatch = 3

    calls = {"single": 0, "multi": 0}

    def fake_step(state, batch, lr, rng):
        calls["single"] += 1
        b = batch["answers"].shape[0]
        return state + 1, {"loss": jnp.float32(state), "preds":
                           jnp.zeros((b,), jnp.int32)}

    def fake_multi(state, batches, lr, rng):
        calls["multi"] += 1
        k, b = batches["answers"].shape[:2]
        losses = jnp.arange(k, dtype=jnp.float32) + state
        return state + k, {"loss": losses,
                           "preds": jnp.zeros((k, b), jnp.int32)}

    runner = Runner(cfg, model=None, train_step=fake_step, eval_step=None,
                    eval_step_att=None, answer_dict=None,
                    train_multistep=fake_multi)

    def mk_batch(q_len):
        b = 4
        return {"questions": np.zeros((b, q_len), np.int32),
                "questionLengths": np.full((b,), q_len, np.int32),
                "images": np.zeros((b, 2, 2, 3), np.float32),
                "answers": np.zeros((b,), np.int32),
                "mask": np.ones((b,), np.float32)}

    # shapes: 3x len5 (full chunk), 2x len7 (shape change -> partial),
    # then 1x len5 (tail partial)
    batches = [mk_batch(5), mk_batch(5), mk_batch(5),
               mk_batch(7), mk_batch(7), mk_batch(5)]

    drained = []

    def drain(pending):
        bn, batch, out, d_atts, times = pending
        drained.append((bn, float(out["loss"])))

    state, cursor = runner._run_chunked(0, iter(batches), jax.random.key(0),
                                        drain, None, None, None, epoch=1)
    assert cursor == 0                            # ran to completion
    assert calls["multi"] == 1                    # one full chunk of 3
    assert calls["single"] == 3                   # 2 + 1 partials
    assert state == 6                             # every batch stepped once
    assert [bn for bn, _ in drained] == list(range(6))


def test_cli_with_steps_per_dispatch(tmp_path):
    """Full CLI training with --stepsPerDispatch 2: the chunked driver
    loop logs per-batch stats, writes checkpoints and preds, and learns
    (same assertions as the per-batch e2e test)."""
    from main import main
    from tests.test_train_e2e import make_cfg
    from mac_network_tpu.data.synthetic import write_synthetic_dataset

    root = tmp_path / "data"
    write_synthetic_dataset(str(root), n_train=48, n_val=24, n_test=24,
                            dims=(16, 5, 5))
    cfg = make_cfg(root, expName="chunked", stepsPerDispatch=2, epochs=3)
    main(cfg)

    with open(cfg.logFile()) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert lines[1].startswith("epoch,trainAcc,valAcc")
    assert len(lines) >= 5                  # header x2 + 3 epoch rows
    first_loss = float(lines[2].split(",")[3])
    last_loss = float(lines[-1].split(",")[3])
    assert last_loss < first_loss, (first_loss, last_loss)
    assert os.path.isdir(cfg.weightsFile(3))
    with open(cfg.predsFile("val")) as f:
        preds = json.load(f)
    assert len(preds) > 0 and all("prediction" in p for p in preds)
