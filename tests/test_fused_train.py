"""Custom-VJP fused training recurrence (ops/pallas/mac_train.py):
gradient parity with the XLA path, multi-tile weight-grad accumulation,
in-kernel dropout behavior, and envelope guards.  Interpret mode on CPU;
the TPU measurement lives in bench.py / ARCHITECTURE.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mac_network_tpu.ops.pallas.mac_train import (
    FusedTrainEngine, supports_fused_train)
from tests.test_pallas import fused_cfg, make_model_batch


def det_cfg(**overrides):
    """Fused-envelope config with every dropout disabled (deterministic
    train step, so fused grads must equal XLA grads exactly)."""
    cfg = fused_cfg(**overrides)
    for k in ("encInputDropout", "stemDropout", "qDropout", "memoryDropout",
              "readDropout", "writeDropout", "outputDropout"):
        setattr(cfg, k, 1.0)
    cfg.memoryVariationalDropout = False
    return cfg


def grad_trees(cfg, batch, batch_tile, seed=3):
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, batch)
    engine = FusedTrainEngine(cfg, emb, batch_tile=batch_tile)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(seed)})
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine.apply))(variables["params"])
    return g_xla, g_fused


def assert_grads_close(g_xla, g_fused):
    flat_f = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_fused)}
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    assert len(flat_x) == len(flat_f)
    for path, v in flat_x:
        k = jax.tree_util.keystr(path)
        got = np.asarray(flat_f[k])
        want = np.asarray(v)
        scale = np.abs(want).max() + 1e-8
        np.testing.assert_allclose(
            got, want, atol=2e-4 + 1e-3 * scale,
            err_msg=f"grad mismatch at {k}")


@pytest.mark.parametrize("gate", [False, True])
def test_fused_train_grads_match_xla(gate):
    """Deterministic envelope: every parameter's gradient from the fused
    fwd+bwd kernels equals the XLA train path."""
    cfg = det_cfg(writeGate=gate)
    assert supports_fused_train(cfg)
    g_xla, g_fused = grad_trees(cfg, batch=8, batch_tile=8)
    assert_grads_close(g_xla, g_fused)


def test_fused_train_multi_tile_accumulation():
    """B=16 with Bt=8 runs two grid cells; weight grads must accumulate
    across cells exactly (the init-on-first-cell reduction pattern)."""
    cfg = det_cfg()
    g_xla, g_fused = grad_trees(cfg, batch=16, batch_tile=8)
    assert_grads_close(g_xla, g_fused)


def test_fused_train_dropout_semantics():
    """Parity-semantics dropout (tied KB + variational memory + fresh
    per-step read dropout via the in-kernel hash RNG): deterministic per
    seed, stochastic across seeds, finite gradients; eval mode identical
    to the XLA path."""
    cfg = fused_cfg(writeGate=True)
    cfg.memoryVariationalDropout = True
    cfg.readVariationalDropout = True
    assert cfg.readDropout < 1.0
    assert supports_fused_train(cfg)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 8)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)

    def loss(seed):
        lg, _ = engine.apply({"params": variables["params"]}, qs, lens,
                             imgs, train=True,
                             rngs={"dropout": jax.random.key(seed)})
        return float(jnp.mean(lg ** 2))

    assert loss(5) == loss(5)
    assert loss(5) != loss(6)

    g = jax.grad(lambda p: jnp.mean(engine.apply(
        {"params": p}, qs, lens, imgs, train=True,
        rngs={"dropout": jax.random.key(5)})[0] ** 2))(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

    lg_e, _ = engine.apply({"params": variables["params"]}, qs, lens, imgs,
                           train=False)
    lg_x, _ = model.apply(variables, qs, lens, imgs, train=False)
    np.testing.assert_allclose(np.asarray(lg_e), np.asarray(lg_x),
                               rtol=2e-5, atol=2e-5)


def test_fused_train_steps_reduce_loss():
    """Ten optimizer steps through make_train_step(engine, ...) reduce the
    training loss (the full fused step is trainable end-to-end)."""
    from mac_network_tpu.train import (
        create_train_state, make_optimizer, make_train_step)
    cfg = det_cfg()
    cfg.lr = 3e-3
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 8)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(engine, cfg, tx)
    batch = {"questions": qs, "questionLengths": lens, "images": imgs,
             "answers": jnp.zeros((8,), jnp.int32),
             "mask": jnp.ones((8,), jnp.float32)}
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch, cfg.lr, jax.random.key(7))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_fused_train_envelope():
    assert supports_fused_train(det_cfg(writeGate=True))
    # per-step (untied) read dropout runs in kb_fresh mode (round 3)
    cfg = fused_cfg()
    cfg.memoryVariationalDropout = True
    assert cfg.readDropout < 1.0 and not cfg.readVariationalDropout
    assert supports_fused_train(cfg)
    # non-variational memory dropout remains outside the envelope
    cfg.memoryVariationalDropout = False
    assert not supports_fused_train(cfg)
    assert not supports_fused_train(det_cfg(writeSelfAtt=True))
    assert not supports_fused_train(det_cfg(
        controlFeedPrev=True, controlFeedPrevAtt=True,
        controlFeedInputs=True, controlContAct="TANH", initCtrl="PRM",
        controlInputUnshared=False))
    assert not supports_fused_train(det_cfg(writeGate=True,
                                            writeGateShared=True))


# ------------------------------- fresh-KB (exact reference parity) mode


@pytest.mark.parametrize("gate", [False, True])
def test_fused_train_fresh_kb_grads_match_xla(gate):
    """kb_fresh mode with dropout disabled computes the SAME math as the
    hoisted path (projections merely move in-kernel), so every gradient
    — including the new in-kernel wpx/w1b/bias grads — must equal XLA."""
    cfg = det_cfg(writeGate=gate)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 8)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8, force_fresh_kb=True)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(3)})
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine.apply))(variables["params"])
    assert_grads_close(g_xla, g_fused)


def test_fused_train_fresh_kb_multi_tile_accumulation():
    """The new wpx/bpx/w1b/b1 grad accumulators must sum correctly
    across grid cells (B=16, Bt=8 -> two cells)."""
    cfg = det_cfg()
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8, force_fresh_kb=True)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(3)})
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine.apply))(variables["params"])
    assert_grads_close(g_xla, g_fused)


def test_fused_train_fresh_kb_dropout_semantics():
    """Reference parity semantics (fresh per-step KB masks, untied):
    deterministic per seed, stochastic across seeds, finite grads, and a
    DIFFERENT loss than tied-mask mode under the same seed (the fresh
    masks really are per-step)."""
    cfg = fused_cfg()
    cfg.memoryVariationalDropout = True
    assert cfg.readDropout < 1.0 and not cfg.readVariationalDropout
    assert supports_fused_train(cfg)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 8)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)

    def loss(e, seed):
        lg, _ = e.apply({"params": variables["params"]}, qs, lens,
                        imgs, train=True,
                        rngs={"dropout": jax.random.key(seed)})
        return float(jnp.mean(lg ** 2))

    assert loss(engine, 5) == loss(engine, 5)
    assert loss(engine, 5) != loss(engine, 6)

    import dataclasses
    cfg_tied = dataclasses.replace(cfg, readVariationalDropout=True)
    tied = FusedTrainEngine(cfg_tied, emb, batch_tile=8)
    assert loss(engine, 5) != loss(tied, 5)

    g = jax.grad(lambda p: jnp.mean(engine.apply(
        {"params": p}, qs, lens, imgs, train=True,
        rngs={"dropout": jax.random.key(5)})[0] ** 2))(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_fused_train_masks_tile_invariant():
    """Regression for the fwd/bwd mask-replay bug: in-kernel dropout
    masks are drawn by GLOBAL batch row, so the loss AND the gradients
    must be identical for batch_tile=16 (fwd Bt=16, bwd capped at Bt=8)
    and batch_tile=8 (both 8).  With tile-local indexing the backward
    would replay different masks than the forward whenever the tiles
    differ, silently corrupting gradients."""
    cfg = fused_cfg(writeGate=True)
    cfg.memoryVariationalDropout = True
    cfg.readVariationalDropout = True          # y/e masks still per-step
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)

    def run(batch_tile):
        engine = FusedTrainEngine(cfg, emb, batch_tile=batch_tile)
        def f(p):
            lg, _ = engine.apply({"params": p}, qs, lens, imgs,
                                 train=True,
                                 rngs={"dropout": jax.random.key(11)})
            return jnp.mean(lg ** 2)
        val, g = jax.value_and_grad(f)(variables["params"])
        return val, g

    v16, g16 = run(16)
    v8, g8 = run(8)
    assert float(v16) == float(v8)
    flat16 = jax.tree_util.tree_leaves_with_path(g16)
    flat8 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g8)}
    for path, v in flat16:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat8[jax.tree_util.keystr(path)]),
            err_msg=f"tile-dependent grad at {jax.tree_util.keystr(path)}")


def kb_sized_allgathers(hlo_text: str, min_elems: int):
    """all-gather ops in an HLO dump whose output holds >= min_elems
    elements (catching XLA's gather-the-custom-call-operands fallback)."""
    import re
    found = []
    for line in hlo_text.splitlines():
        if "all-gather(" not in line and "all-gather-start(" not in line:
            continue
        m = re.search(r"=\s*(?:\()?[a-z0-9]+\[([0-9,]*)\]", line)
        if not m:
            continue
        dims = [int(x) for x in m.group(1).split(",") if x]
        n = int(np.prod(dims)) if dims else 1
        if n >= min_elems:
            found.append(line.strip()[:160])
    return found


def test_fused_train_under_dp_mesh():
    """--fusedTrain composes with the data-parallel mesh: the fwd/bwd
    kernels shard_map over the data axis (each device runs its batch
    shard; the only collective is the weight-grad psum), so results equal
    the single-device fused step AND the compiled program contains no
    all-gather of KB-sized operands — true kernel-granular DP, the
    working completion of the reference's towers (model.py:671-679)."""
    import numpy as _np
    from mac_network_tpu.train import (create_train_state, make_optimizer,
                                       make_train_step)
    from mac_network_tpu.parallel import make_mesh, shard_batch, shard_params

    def run(mesh_on):
        cfg = det_cfg()
        if mesh_on:
            cfg.meshData = 8
        model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
        tx = make_optimizer(cfg)
        batch = {"questions": _np.asarray(qs),
                 "questionLengths": _np.asarray(lens),
                 "images": _np.asarray(imgs),
                 "answers": _np.zeros((16,), _np.int32),
                 "mask": _np.ones((16,), _np.float32)}
        mesh = None
        if mesh_on:
            mesh = make_mesh(cfg)
            params = shard_params(variables["params"], mesh)
            batch = shard_batch(batch, mesh)
        else:
            params = variables["params"]
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        engine = FusedTrainEngine(cfg, emb, batch_tile=8, mesh=mesh)
        state = create_train_state(cfg, {"params": params}, tx)
        step = make_train_step(engine, cfg, tx)
        if mesh_on:
            txt = step.lower(state, batch, cfg.lr,
                             jax.random.key(0)).compile().as_text()
            H, W, C = cfg.imageDims
            bad = kb_sized_allgathers(txt, 16 * H * W * cfg.memDim // 2)
            assert not bad, "KB-sized all-gather in the fused mesh step:\n" \
                + "\n".join(bad)
        losses = []
        for _ in range(2):
            state, m = step(state, batch, cfg.lr, jax.random.key(0))
            losses.append(float(m["loss"]))
        return losses

    assert jax.device_count() >= 8
    np.testing.assert_allclose(run(False), run(True), rtol=2e-5)


def test_fused_train_mesh_grads_match_single_device():
    """Deterministic envelope: per-parameter grads from the mesh-sharded
    fused recurrence equal the single-device fused recurrence (which
    itself equals XLA — test_fused_train_grads_match_xla)."""
    from mac_network_tpu.parallel import make_mesh
    cfg = det_cfg(writeGate=True)
    cfg.meshData = 8
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
    mesh = make_mesh(cfg)

    def grads(mesh_arg):
        engine = FusedTrainEngine(cfg, emb, batch_tile=8, mesh=mesh_arg)
        def f(p):
            lg, _ = engine.apply({"params": p}, qs, lens, imgs, train=True,
                                 rngs={"dropout": jax.random.key(3)})
            return jnp.mean(lg ** 2)
        return jax.jit(jax.grad(f))(variables["params"])

    g1 = grads(None)
    gM = grads(mesh)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flatM = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(gM)}
    for path, v in flat1:
        k = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flatM[k]), np.asarray(v), rtol=1e-5, atol=1e-6,
            err_msg=f"mesh-dependent grad at {k}")


def test_fused_train_mesh_dropout_stochastic_and_deterministic():
    """Under the mesh, the in-kernel dropout decorrelates across shards
    (per-shard seed fold) yet stays deterministic per seed; eval equals
    the XLA path."""
    from mac_network_tpu.parallel import make_mesh
    cfg = fused_cfg(writeGate=True)
    cfg.memoryVariationalDropout = True
    cfg.readVariationalDropout = True
    cfg.meshData = 8
    assert supports_fused_train(cfg)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
    mesh = make_mesh(cfg)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8, mesh=mesh)

    @jax.jit
    def loss(seed):
        lg, _ = engine.apply({"params": variables["params"]}, qs, lens,
                             imgs, train=True,
                             rngs={"dropout": seed})
        return jnp.mean(lg ** 2)

    assert float(loss(jax.random.key(5))) == float(loss(jax.random.key(5)))
    assert float(loss(jax.random.key(5))) != float(loss(jax.random.key(6)))

    lg_e, _ = jax.jit(lambda: engine.apply(
        {"params": variables["params"]}, qs, lens, imgs, train=False))()
    lg_x, _ = model.apply(variables, qs, lens, imgs, train=False)
    np.testing.assert_allclose(np.asarray(lg_e), np.asarray(lg_x),
                               rtol=2e-5, atol=2e-5)


# ------------------------------------------- GQA per-example KB masks

def gqa_det_cfg(**overrides):
    return det_cfg(dataset="GQA", imageDims=[1, 10, 24],
                   stemNumLayers=1, stemKernelSize=1, **overrides)


def make_model_gqa_batch(cfg, batch, n_obj):
    N, D = cfg.imageDims[1], cfg.imageDims[2]
    rng = np.random.RandomState(0)
    from tests.test_pallas import VOCAB, L
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    from mac_network_tpu.models import MACNetwork
    model = MACNetwork(cfg, emb)
    qs = jnp.asarray(rng.randint(1, VOCAB, (batch, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(3, L + 1, (batch,)), jnp.int32)
    imgs = jnp.asarray(rng.randn(batch, 1, N, D), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        qs, lens, imgs, train=False, kb_lengths=n_obj)
    return model, emb, variables, qs, lens, imgs


@pytest.mark.parametrize("fresh", [False, True])
def test_fused_train_gqa_grads_match_xla(fresh):
    """kb_lengths through the fused train pair (fwd read-softmax mask +
    bwd recompute): every gradient equals the XLA path, in both the
    hoisted and the fresh-KB (in-kernel projections) modes.  Includes a
    zero-object example (clamped to the slot-0 floor in both paths)."""
    cfg = gqa_det_cfg()
    assert supports_fused_train(cfg)
    n_obj = jnp.asarray([3, 7, 10, 0, 1, 9, 4, 10], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa_batch(
        cfg, 8, n_obj)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8, force_fresh_kb=fresh)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(3)},
                             kb_lengths=n_obj)
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine.apply))(variables["params"])
    assert_grads_close(g_xla, g_fused)


def test_fused_train_gqa_padded_slot_grad_invariance():
    """Garbage in padded object slots must change NEITHER the loss NOR any
    gradient: masked slots get zero read attention in the forward and the
    backward's recomputed chain zeroes every per-slot cotangent there."""
    cfg = gqa_det_cfg()
    N = cfg.imageDims[1]
    n_obj = jnp.asarray([3, 7, N, 5, 1, 9, 4, N], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa_batch(
        cfg, 8, n_obj)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)

    def val_and_grad(images):
        def f(p):
            lg, _ = engine.apply({"params": p}, qs, lens, images,
                                 train=True,
                                 rngs={"dropout": jax.random.key(3)},
                                 kb_lengths=n_obj)
            return jnp.mean(lg ** 2)
        return jax.value_and_grad(f)(variables["params"])

    v1, g1 = val_and_grad(imgs)
    garbage = np.asarray(imgs).copy()
    rng = np.random.RandomState(9)
    for b in range(8):
        k = int(n_obj[b])
        if k < N:
            garbage[b, :, k:] = 100.0 * rng.randn(1, N - k,
                                                  cfg.imageDims[2])
    v2, g2 = val_and_grad(jnp.asarray(garbage))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g2)}
    for path, v in flat1:
        k = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"padded-slot-dependent grad at {k}")


def test_fused_train_gqa_multi_tile():
    """kb_lengths with B=16 / Bt=8 (two grid cells): the per-tile mask
    rows must follow their batch tiles."""
    cfg = gqa_det_cfg()
    n_obj = jnp.asarray([3, 7, 10, 5, 1, 9, 4, 10,
                         2, 10, 6, 8, 1, 3, 10, 5], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa_batch(
        cfg, 16, n_obj)
    engine = FusedTrainEngine(cfg, emb, batch_tile=8)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(3)},
                             kb_lengths=n_obj)
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine.apply))(variables["params"])
    assert_grads_close(g_xla, g_fused)
