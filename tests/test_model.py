"""Model-level tests: shape/dtype properties for the MAC network across the
reference's shipped config variants (configs/args.txt ... args4.txt —
readme.md:87-95 behavioral matrix), plus baselines."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mac_network_tpu.config import Config, config_clevr
from mac_network_tpu.models import MACNetwork

B, L, H, W, C = 4, 9, 7, 7, 32
VOCAB, ANSWERS = 30, 10
E = 16


def small_cfg(**overrides):
    cfg = Config()
    cfg.dataset = "CLEVR"
    # shrink everything for CPU tests
    cfg.wrdEmbDim = E
    cfg.encDim = 24
    cfg.ctrlDim = 24
    cfg.memDim = 24
    cfg.attDim = 24
    cfg.stemDim = 24
    cfg.netLength = 3
    cfg.outClassifierDims = [32]
    cfg.answerWordsNum = ANSWERS
    cfg.questionWordsNum = VOCAB
    cfg.imageDims = [H, W, C]
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


# flag sets distilled from the five shipped variant files
ARGS_COMMON = dict(useEMA=True, lrReduce=True, adam=True, clipGradients=True,
                   memoryVariationalDropout=True, relu="ELU", encBi=True,
                   wrdEmbRandom=True, wrdEmbUniform=True, outQuestion=True,
                   controlContextual=True, readProjInputs=True,
                   readMemConcatKB=True, readMemConcatProj=True,
                   readMemProj=True, readCtrl=True, writeMemProj=True)
VARIANTS = {
    "args": dict(ARGS_COMMON, initCtrl="Q", controlInputUnshared=True),
    "args1": dict(ARGS_COMMON, initCtrl="PRM", controlFeedPrev=True,
                  controlFeedPrevAtt=True, controlFeedInputs=True,
                  controlContAct="TANH"),
    "args2": dict(ARGS_COMMON, initCtrl="Q", controlInputUnshared=True,
                  qDropout=0.85, stemDropout=0.85, noBucket=True,
                  noRebucket=True),
    "args3": dict(ARGS_COMMON, initCtrl="Q", controlInputUnshared=True,
                  writeSelfAtt=True, writeSelfAttMod="CONT"),
    "args4": dict(ARGS_COMMON, initCtrl="Q", controlInputUnshared=True,
                  writeGate=True),
}


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    qs = rng.randint(1, VOCAB, size=(B, L)).astype(np.int32)
    lengths = rng.randint(2, L + 1, size=(B,)).astype(np.int32)
    images = rng.randn(B, H, W, C).astype(np.float32)
    answers = rng.randint(0, ANSWERS, size=(B,)).astype(np.int32)
    return jnp.asarray(qs), jnp.asarray(lengths), jnp.asarray(images), answers


def make_embedding_init(cfg):
    rng = np.random.RandomState(0)
    if cfg.ansEmbMod == "SHARED":
        return {"qa": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
                "ansMap": np.arange(ANSWERS, dtype=np.int32)}
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    if cfg.ansEmbMod == "BOTH":
        emb["a"] = rng.randn(ANSWERS, cfg.wrdEmbDim).astype(np.float32)
    return emb


def init_and_apply(cfg, train=False):
    model = MACNetwork(cfg, make_embedding_init(cfg))
    qs, lengths, images, _ = make_inputs()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images, train=train)
    if train:
        (logits, atts), _ = model.apply(
            variables, qs, lengths, images, train=True,
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    else:
        logits, atts = model.apply(variables, qs, lengths, images, train=False)
    return logits, atts, variables


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_variant_forward(variant):
    cfg = small_cfg(**VARIANTS[variant])
    logits, atts, _ = init_and_apply(cfg)
    assert logits.shape == (B, ANSWERS)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()
    assert atts["question"].shape[0] == cfg.netLength
    assert atts["kb"].shape == (cfg.netLength, B, H * W)
    if cfg.writeSelfAtt:
        assert "self" in atts
    if cfg.writeGate:
        assert "gate" in atts


def test_variant_train_mode_runs():
    cfg = small_cfg(**VARIANTS["args"])
    logits, _, _ = init_and_apply(cfg, train=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_attention_rows_normalized():
    cfg = small_cfg(**VARIANTS["args"])
    _, atts, _ = init_and_apply(cfg)
    np.testing.assert_allclose(np.asarray(atts["kb"]).sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(atts["question"]).sum(-1), 1.0,
                               atol=1e-4)


def test_question_attention_respects_mask():
    cfg = small_cfg(**VARIANTS["args"])
    _, atts, _ = init_and_apply(cfg)
    qs, lengths, _, _ = make_inputs()
    att = np.asarray(atts["question"])      # [T, B, L]
    for b in range(B):
        ln = int(lengths[b])
        assert att[:, b, ln:].max(initial=0.0) < 1e-6


def test_pad_row_embedding_is_zero():
    cfg = small_cfg(**VARIANTS["args"])
    _, _, variables = init_and_apply(cfg)
    emb = variables["params"]["qEmbeddings"]["emb"]
    assert emb.shape == (VOCAB - 1, cfg.wrdEmbDim)  # row 0 added in-graph


def test_unshared_cells():
    cfg = small_cfg(**VARIANTS["args"], unsharedCells=True)
    logits, _, variables = init_and_apply(cfg)
    assert logits.shape == (B, ANSWERS)
    mac = variables["params"]["mac"]
    assert "cell0" in mac and "cell2" in mac


def test_shared_cells_single_param_set():
    cfg = small_cfg(**VARIANTS["args"])
    _, _, variables = init_and_apply(cfg)
    mac = variables["params"]["mac"]
    assert "cell" in mac and "cell1" not in mac
    # per-step unshared question projections exist
    assert "qInput0" in mac and "qInput2" in mac


def test_bf16_compute():
    cfg = small_cfg(**VARIANTS["args"], computeDtype="bfloat16")
    logits, atts, _ = init_and_apply(cfg)
    assert logits.dtype == jnp.float32   # logits always f32
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("kind", ["CNN", "LSTM", "CNN+LSTM", "ATT"])
def test_baselines(kind):
    over = dict(useBaseline=True)
    if kind == "CNN":
        over["baselineCNN"] = True
    elif kind == "LSTM":
        over["baselineLSTM"] = True
    elif kind == "CNN+LSTM":
        over["baselineCNN"] = True
        over["baselineLSTM"] = True
    else:
        over["baselineAtt"] = True
    cfg = small_cfg(**over)
    logits, _, _ = init_and_apply(cfg)
    assert logits.shape == (B, ANSWERS)


def test_answer_embedding_modes():
    for mode, emb_mode in (("MUL", "BOTH"), ("DIAG", "BOTH"), ("BL", "BOTH"),
                           ("MUL", "SHARED")):
        cfg = small_cfg(**VARIANTS["args"], answerMod=mode, ansEmbMod=emb_mode)
        logits, _, _ = init_and_apply(cfg)
        assert logits.shape == (B, ANSWERS), (mode, emb_mode)


def test_eval_deterministic():
    cfg = small_cfg(**VARIANTS["args"])
    model = MACNetwork(cfg, make_embedding_init(cfg))
    qs, lengths, images, _ = make_inputs()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images)
    l1, _ = model.apply(variables, qs, lengths, images, train=False)
    l2, _ = model.apply(variables, qs, lengths, images, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_kb_proj_hoisting_matches_unhoisted():
    """Eval-time hoisted KB projection must be numerically identical to the
    per-step path (same params, no dropout)."""
    cfg = small_cfg(**VARIANTS["args"])
    model = MACNetwork(cfg, make_embedding_init(cfg))
    qs, lengths, images, _ = make_inputs()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images)
    l1, _ = model.apply(variables, qs, lengths, images, train=False)
    # disable hoisting by pretending training with dropout off
    cfg2 = small_cfg(**VARIANTS["args"])
    cfg2.readDropout = 1.0
    cfg2.memoryDropout = 1.0
    cfg2.qDropout = 1.0
    cfg2.stemDropout = 1.0
    cfg2.encInputDropout = 1.0
    cfg2.outputDropout = 1.0
    cfg2.memoryVariationalDropout = False
    model2 = MACNetwork(cfg2, make_embedding_init(cfg2))
    l_eval, _ = model2.apply(variables, qs, lengths, images, train=False)
    l_train, _ = model2.apply(variables, qs, lengths, images, train=True,
                              rngs={"dropout": jax.random.key(3)})
    np.testing.assert_allclose(np.asarray(l_eval), np.asarray(l_train),
                               rtol=2e-5, atol=2e-5)


def test_read_variational_dropout():
    """--readVariationalDropout ties the KB dropout mask across steps and
    enables the train-time projection hoist; eval is unchanged, training
    stays stochastic and differentiable."""
    base = small_cfg(readDropout=0.5, controlContextual=True,
                     readProjInputs=True, readMemConcatKB=True,
                     readMemConcatProj=True, readMemProj=True)
    tied = dataclasses.replace(base, readVariationalDropout=True)
    model_b = MACNetwork(base, make_embedding_init(base))
    model_t = MACNetwork(tied, make_embedding_init(tied))
    rng = jax.random.key(0)
    qs = jax.random.randint(jax.random.key(1), (B, L), 1, VOCAB)
    lens = jnp.full((B,), L, jnp.int32)
    imgs = jax.random.normal(jax.random.key(2), (B, H, W, C))
    variables = model_b.init({"params": jax.random.key(7),
                              "dropout": jax.random.key(8)},
                             qs, lens, imgs)

    # eval path identical (dropout inactive, same hoist)
    lb, _ = model_b.apply(variables, qs, lens, imgs, train=False)
    lt, _ = model_t.apply(variables, qs, lens, imgs, train=False)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)

    # train path: stochastic across rngs, deterministic per rng, finite grads
    t1, _ = model_t.apply(variables, qs, lens, imgs, train=True,
                          rngs={"dropout": jax.random.key(3)})
    t1b, _ = model_t.apply(variables, qs, lens, imgs, train=True,
                           rngs={"dropout": jax.random.key(3)})
    t2, _ = model_t.apply(variables, qs, lens, imgs, train=True,
                          rngs={"dropout": jax.random.key(4)})
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))

    def loss(p):
        lg, _ = model_t.apply({"params": p}, qs, lens, imgs, train=True,
                              rngs={"dropout": jax.random.key(5)})
        return jnp.mean(lg ** 2)
    grads = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
