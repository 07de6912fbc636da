"""Numerics parity of the fused Pallas MAC kernel against the XLA path
(SURVEY.md §7.9: "numerics-parity tests vs the jit reference
implementation").  Runs in interpreter mode on the CPU test platform; the
same kernel compiles on TPU (exercised by bench.py --pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mac_network_tpu.config import Config
from mac_network_tpu.models import MACNetwork
from mac_network_tpu.ops.pallas import (
    FusedMACEngine, supports_fused_config)

B, L, H, W, C = 8, 12, 5, 5, 16
VOCAB, ANSWERS = 30, 10


def fused_cfg(**overrides):
    cfg = Config()
    cfg.wrdEmbDim = 16
    cfg.encDim = cfg.ctrlDim = cfg.memDim = cfg.attDim = cfg.stemDim = 32
    cfg.netLength = 3
    cfg.outClassifierDims = [32]
    cfg.questionWordsNum = VOCAB
    cfg.answerWordsNum = ANSWERS
    cfg.imageDims = [H, W, C]
    cfg.encBi = True
    cfg.relu = "ELU"
    cfg.outQuestion = True
    cfg.initCtrl = "Q"
    cfg.controlContextual = True
    cfg.controlInputUnshared = True
    cfg.readProjInputs = True
    cfg.readMemConcatKB = True
    cfg.readMemConcatProj = True
    cfg.readMemProj = True
    cfg.readCtrl = True
    cfg.writeMemProj = True
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def make_model(cfg):
    rng = np.random.RandomState(0)
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    model = MACNetwork(cfg, emb)
    qs = jnp.asarray(rng.randint(1, VOCAB, (B, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(3, L + 1, (B,)), jnp.int32)
    imgs = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        qs, lens, imgs, train=False)
    return model, emb, variables, qs, lens, imgs


def test_supports_config():
    assert supports_fused_config(fused_cfg())
    assert supports_fused_config(fused_cfg(writeGate=True))
    # v2 envelope: args3 (write self-attention) and args1 (recurrent
    # control) are supported; their combination is not
    assert supports_fused_config(fused_cfg(writeSelfAtt=True))
    assert supports_fused_config(fused_cfg(
        controlFeedPrev=True, controlFeedPrevAtt=True,
        controlFeedInputs=True, controlContAct="TANH", initCtrl="PRM",
        controlInputUnshared=False))
    assert not supports_fused_config(fused_cfg(
        controlFeedPrev=True, writeSelfAtt=True))
    assert not supports_fused_config(fused_cfg(readMemProj=False))
    assert not supports_fused_config(fused_cfg(unsharedCells=True))


def test_fused_matches_xla_args1_recurrent_control():
    """args1 variant: controlFeedPrev + FeedPrevAtt + FeedInputs + TANH
    contControl, PRM init, shared qInput (configs/args1.txt)."""
    cfg = fused_cfg(controlFeedPrev=True, controlFeedPrevAtt=True,
                    controlFeedInputs=True, controlContAct="TANH",
                    initCtrl="PRM", controlInputUnshared=False)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_xla_args1_no_feedprevatt():
    """controlFeedPrev with the cont-control carry (FeedPrevAtt off)."""
    cfg = fused_cfg(controlFeedPrev=True, controlFeedPrevAtt=False,
                    controlFeedInputs=True, controlContAct="TANH",
                    initCtrl="PRM", controlInputUnshared=False)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mod", ["CONT", "NON"])
def test_fused_matches_xla_args3_self_attention(mod):
    """args3 variant: write-unit self-attention over the step history
    (configs/args3.txt uses writeSelfAttMod=CONT)."""
    cfg = fused_cfg(writeSelfAtt=True, writeSelfAttMod=mod)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_xla_args3_plus_gate():
    """self-attention and the write gate compose (both hoisted)."""
    cfg = fused_cfg(writeSelfAtt=True, writeSelfAttMod="CONT",
                    writeGate=True)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("gate", [False, True, "shared"])
def test_fused_matches_xla(gate):
    cfg = fused_cfg(writeGate=bool(gate),
                    writeGateShared=(gate == "shared"))
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)

    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_xla_prm_init_and_shared_qinput():
    cfg = fused_cfg(initCtrl="PRM", initMem="PRM",
                    controlInputUnshared=False)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=8)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def make_model_batch(cfg, batch):
    """make_model with an arbitrary batch size."""
    rng = np.random.RandomState(0)
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    model = MACNetwork(cfg, emb)
    qs = jnp.asarray(rng.randint(1, VOCAB, (batch, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(3, L + 1, (batch,)), jnp.int32)
    imgs = jnp.asarray(rng.randn(batch, H, W, C), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        qs, lens, imgs, train=False)
    return model, emb, variables, qs, lens, imgs


def test_fused_matches_xla_feedprev_relu_dispatch():
    """controlContAct='RELU' must dispatch through cfg.relu ('ELU' here)
    in the fused feedprev kernel, matching activations.apply_act_fn
    (round-2 advisor finding)."""
    cfg = fused_cfg(controlFeedPrev=True, controlFeedPrevAtt=True,
                    controlFeedInputs=True, controlContAct="RELU",
                    initCtrl="PRM", controlInputUnshared=False)
    assert cfg.relu == "ELU"
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_chunked_and_ragged_batch(monkeypatch):
    """Batches above _MAX_CALL_BATCH run as chunks even when not an exact
    multiple, and ragged tails are padded to the sublane tile (round-2
    VERDICT weak #6: B=768 used to fall through to one giant call)."""
    import mac_network_tpu.ops.pallas.mac_fused as mf
    cfg = fused_cfg(writeGate=True)
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 20)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    # 20 = 8 + 8 + ragged 4 once the chunk size is 8
    monkeypatch.setattr(mf, "_MAX_CALL_BATCH", 8)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_b768_chunks():
    """True B=768 (> 512, not a multiple): two chunks, numerics match."""
    cfg = fused_cfg()
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 768)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=8)
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["plain", "gate", "satt"])
def test_fused_attention_outputs_match_xla(variant):
    """get_att on the fused engine (memory-history debug output + XLA
    recompute of the read attention) must reproduce the XLA path's
    attention maps and leave the logits unchanged (round-2 VERDICT
    missing #5 / SURVEY §7 'debug outputs path')."""
    over = {"gate": dict(writeGate=True),
            "satt": dict(writeSelfAtt=True, writeSelfAttMod="CONT")}
    cfg = fused_cfg(**over.get(variant, {}))
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, ref_atts = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    plain = engine(variables, qs, lens, imgs, interpret=True)
    logits, atts = engine(variables, qs, lens, imgs, interpret=True,
                          get_att=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
    expected_keys = {"question", "kb"}
    if variant == "gate":
        expected_keys.add("gate")
    if variant == "satt":
        expected_keys.add("self")
    assert set(atts) == expected_keys
    for k in expected_keys:
        assert atts[k].shape == ref_atts[k].shape, (
            k, atts[k].shape, ref_atts[k].shape)
        np.testing.assert_allclose(
            np.asarray(atts[k]), np.asarray(ref_atts[k]),
            rtol=2e-4, atol=2e-4, err_msg=f"attention {k!r} diverges")


def test_fused_get_att_rejects_feedprev():
    cfg = fused_cfg(controlFeedPrev=True, controlFeedPrevAtt=True,
                    controlFeedInputs=True, controlContAct="TANH",
                    initCtrl="PRM", controlInputUnshared=False)
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    with pytest.raises(NotImplementedError):
        engine(variables, qs, lens, imgs, interpret=True, get_att=True)


def test_fused_respects_question_mask():
    """Padding words must not receive control attention: compare logits for
    two paddings of the same question."""
    cfg = fused_cfg()
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got1 = engine(variables, qs, lens, imgs, interpret=True)
    qs2 = jnp.concatenate([qs, jnp.full((B, 3), 7, jnp.int32)], axis=1)
    got2 = engine(variables, qs2, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got2),
                               rtol=2e-4, atol=2e-4)


def test_fused_bilstm_matches_rnnlayer():
    """The Pallas bi-LSTM kernel reproduces RNNLayer's masked
    bidirectional dynamic_rnn semantics on the same parameters."""
    from mac_network_tpu.ops.rnn import RNNLayer
    from mac_network_tpu.ops.pallas.lstm_fused import (
        fused_bilstm, supports_fused_encoder)

    cfg = fused_cfg()
    cfg.encDim = 256          # h=128 per direction — lane-tile aligned
    cfg.encType = "LSTM"
    cfg.encBi = True
    cfg.encNumLayers = 1
    assert supports_fused_encoder(cfg)

    B, L, D = 8, 10, 48
    words = jax.random.normal(jax.random.key(0), (B, L, D), jnp.float32)
    lengths = jnp.array([10, 3, 7, 1, 10, 5, 2, 9], jnp.int32)
    layer = RNNLayer(cfg.encDim, cfg, bi=True, cell_type="LSTM")
    params = layer.init(jax.random.key(1), words, lengths)["params"]
    cntx_ref, vec_ref = layer.apply({"params": params}, words, lengths)

    cntx, vec = fused_bilstm(cfg, params, words, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(cntx), np.asarray(cntx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vec), np.asarray(vec_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_engine_with_fused_encoder():
    """Full engine parity when the encoder also runs through the Pallas
    bi-LSTM (encDim sized to the kernel's lane-tile envelope)."""
    cfg = fused_cfg()
    cfg.encDim = 256
    cfg.ctrlDim = cfg.memDim = cfg.attDim = 256
    model, emb, variables, qs, lens, imgs = make_model(cfg)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    assert engine._fused_enc
    got = engine(variables, qs, lens, imgs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------- GQA per-example KB masks

def make_model_gqa(cfg, n_obj):
    """make_model over a [1, N, D] object-features grid with per-example
    valid-object counts (GQA objects mode)."""
    N, D = cfg.imageDims[1], cfg.imageDims[2]
    rng = np.random.RandomState(0)
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    model = MACNetwork(cfg, emb)
    qs = jnp.asarray(rng.randint(1, VOCAB, (B, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(3, L + 1, (B,)), jnp.int32)
    imgs = jnp.asarray(rng.randn(B, 1, N, D), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        qs, lens, imgs, train=False, kb_lengths=n_obj)
    return model, emb, variables, qs, lens, imgs


def gqa_fused_cfg(**overrides):
    # GQA objects mode: [1, N, D] grid, pointwise stem (config_gqa)
    return fused_cfg(dataset="GQA", imageDims=[1, 10, 24],
                     stemNumLayers=1, stemKernelSize=1, **overrides)


@pytest.mark.parametrize("gate", [False, True])
def test_fused_matches_xla_gqa_kb_lengths(gate):
    """Per-example KB masks (GQA kb_lengths) inside the fused kernel match
    the XLA path's masked_softmax (models/mac_cell.py ReadUnit)."""
    cfg = gqa_fused_cfg(writeGate=gate)
    assert supports_fused_config(cfg)
    n_obj = jnp.asarray([3, 7, 10, 5, 1, 9, 4, 10], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa(cfg, n_obj)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False,
                              kb_lengths=n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True,
                 kb_lengths=n_obj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_gqa_padded_slot_invariance():
    """Garbage in the padded object slots must not change the fused
    engine's logits — the in-kernel mask zeroes them out of the read
    attention (mirrors test_gqa.py's XLA-path invariance test)."""
    cfg = gqa_fused_cfg()
    N = cfg.imageDims[1]
    n_obj = jnp.asarray([3, 7, N, 5, 1, 9, 4, N], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa(cfg, n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got1 = engine(variables, qs, lens, imgs, interpret=True,
                  kb_lengths=n_obj)
    garbage = np.asarray(imgs).copy()
    rng = np.random.RandomState(3)
    for b in range(B):
        k = int(n_obj[b])
        if k < N:
            garbage[b, :, k:] = 100.0 * rng.randn(1, N - k,
                                                  cfg.imageDims[2])
    got2 = engine(variables, qs, lens, jnp.asarray(garbage),
                  interpret=True, kb_lengths=n_obj)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got2),
                               rtol=2e-4, atol=2e-4)
    # and without the mask the garbage DOES change the logits
    got3 = engine(variables, qs, lens, jnp.asarray(garbage),
                  interpret=True)
    assert np.abs(np.asarray(got3) - np.asarray(got1)).max() > 1e-3


def test_fused_gqa_attention_outputs():
    """getAtt through the fused engine on a GQA config: the recomputed KB
    attentions match the XLA path's and are exactly zero on padded
    slots."""
    cfg = gqa_fused_cfg()
    N = cfg.imageDims[1]
    n_obj = jnp.asarray([3, 7, N, 5, 1, 9, 4, N], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa(cfg, n_obj)
    expected, atts_ref = model.apply(variables, qs, lens, imgs,
                                     train=False, kb_lengths=n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got, atts = engine(variables, qs, lens, imgs, interpret=True,
                       get_att=True, kb_lengths=n_obj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
    kb = np.asarray(atts["kb"])
    np.testing.assert_allclose(kb, np.asarray(atts_ref["kb"]),
                               rtol=2e-4, atol=2e-4)
    for b in range(B):
        k = int(n_obj[b])
        if k < N:
            assert np.abs(kb[:, b, k:]).max() == 0.0


def test_fused_matches_xla_gqa_feedprev():
    """kb_lengths through the feedprev (args1-style) kernel body too."""
    cfg = gqa_fused_cfg(controlFeedPrev=True, controlFeedPrevAtt=True,
                        controlFeedInputs=True, controlContAct="TANH",
                        initCtrl="PRM", controlInputUnshared=False)
    assert supports_fused_config(cfg)
    n_obj = jnp.asarray([3, 7, 10, 5, 1, 9, 4, 10], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa(cfg, n_obj)
    expected, _ = model.apply(variables, qs, lens, imgs, train=False,
                              kb_lengths=n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got = engine(variables, qs, lens, imgs, interpret=True,
                 kb_lengths=n_obj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------- mesh-sharded serving

def test_fused_engine_under_mesh_matches_single_device():
    """The serving engine partitions its pallas calls over a data mesh
    with shard_map: logits equal the single-device fused engine, and the
    compiled program contains NO all-gather of KB-sized operands (XLA's
    default for an opaque custom call is to gather its inputs)."""
    from mac_network_tpu.parallel import make_mesh, shard_batch
    from tests.test_fused_train import kb_sized_allgathers
    cfg = fused_cfg(writeGate=True)
    cfg.meshData = 8
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
    mesh = make_mesh(cfg)
    eng1 = FusedMACEngine(cfg, emb, batch_tile=8)
    engM = FusedMACEngine(cfg, emb, batch_tile=8, mesh=mesh)
    want = eng1(variables, qs, lens, imgs, interpret=True)

    batch = shard_batch({"q": np.asarray(qs), "l": np.asarray(lens),
                         "im": np.asarray(imgs)}, mesh)
    f = jax.jit(lambda v, q, l, im: engM(v, q, l, im, interpret=True))
    got = f(variables, batch["q"], batch["l"], batch["im"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    txt = f.lower(variables, batch["q"], batch["l"],
                  batch["im"]).compile().as_text()
    bad = kb_sized_allgathers(txt, 16 * H * W * cfg.memDim // 2)
    assert not bad, "KB-sized all-gather in mesh serving:\n" + "\n".join(bad)


def test_fused_engine_under_mesh_get_att():
    """Attention-map serving (get_att debug outputs) under the mesh."""
    from mac_network_tpu.parallel import make_mesh
    cfg = fused_cfg(writeGate=True)
    cfg.meshData = 4
    model, emb, variables, qs, lens, imgs = make_model_batch(cfg, 16)
    mesh = make_mesh(cfg)
    eng1 = FusedMACEngine(cfg, emb, batch_tile=8)
    engM = FusedMACEngine(cfg, emb, batch_tile=8, mesh=mesh)
    want, atts1 = eng1(variables, qs, lens, imgs, interpret=True,
                       get_att=True)
    got, attsM = jax.jit(lambda v, q, l, im: engM(
        v, q, l, im, interpret=True, get_att=True))(variables, qs, lens,
                                                    imgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for k in atts1:
        np.testing.assert_allclose(
            np.asarray(attsM[k]), np.asarray(atts1[k]),
            rtol=2e-4, atol=2e-4, err_msg=f"mesh attention mismatch: {k}")


def test_fused_engine_mesh_gqa_kb_lengths():
    """GQA per-example KB masks shard over 'data' with the batch."""
    from mac_network_tpu.parallel import make_mesh
    cfg = gqa_fused_cfg(writeGate=True)
    cfg.meshData = 4
    N = cfg.imageDims[1]
    rng = np.random.RandomState(0)
    n_obj = jnp.asarray(rng.randint(1, N + 1, (16,)), jnp.int32)
    emb = {"q": rng.randn(VOCAB - 1, cfg.wrdEmbDim).astype(np.float32),
           "a": None}
    model = MACNetwork(cfg, emb)
    qs = jnp.asarray(rng.randint(1, VOCAB, (16, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(3, L + 1, (16,)), jnp.int32)
    imgs = jnp.asarray(rng.randn(16, 1, N, cfg.imageDims[2]), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        qs, lens, imgs, train=False, kb_lengths=n_obj)
    mesh = make_mesh(cfg)
    eng1 = FusedMACEngine(cfg, emb, batch_tile=8)
    engM = FusedMACEngine(cfg, emb, batch_tile=8, mesh=mesh)
    want = eng1(variables, qs, lens, imgs, interpret=True,
                kb_lengths=n_obj)
    got = jax.jit(lambda v, q, l, im, ko: engM(
        v, q, l, im, interpret=True, kb_lengths=ko))(
        variables, qs, lens, imgs, n_obj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gqa_zero_objects_pinned():
    """kb_lengths == 0 (an image with no detected objects) is clamped to a
    >= 1 valid-slot floor at every consumption site: the example attends
    ONLY to slot 0, and the XLA path, the fused engine, and the exported
    attention maps all agree.  Without the clamp the two engines diverge:
    jax.nn.softmax's max-subtraction cancels a uniform -1e30 (ordinary
    softmax over ALL slots) while the kernels' max-free softmax underflows
    an all-masked row to zeros (ADVICE r3)."""
    cfg = gqa_fused_cfg(writeGate=True)
    assert supports_fused_config(cfg)
    n_obj = jnp.asarray([0, 7, 10, 0, 1, 9, 4, 10], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa(cfg, n_obj)
    # real GQA data zero-pads undetected slots; zero slot 0 of the
    # zero-object rows so the pinned semantics (info == 0) is visible
    imgs = imgs.at[0, :, 0, :].set(0.0).at[3, :, 0, :].set(0.0)

    expected, atts_x = model.apply(variables, qs, lens, imgs, train=False,
                                   kb_lengths=n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=4)
    got, atts_f = engine(variables, qs, lens, imgs, interpret=True,
                         kb_lengths=n_obj, get_att=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
    # attention maps: all mass on slot 0 for the zero-object examples,
    # identical between engines
    kb_x = np.asarray(atts_x["kb"])               # [T, B, S]
    kb_f = np.asarray(atts_f["kb"])
    np.testing.assert_allclose(kb_f, kb_x, rtol=2e-4, atol=2e-4)
    for b in (0, 3):
        np.testing.assert_allclose(kb_x[:, b, 0], 1.0, atol=1e-5)
        assert np.abs(kb_x[:, b, 1:]).max() < 1e-5


def test_gqa_hundred_object_envelope():
    """The GQA real operating point's GEOMETRY (BASELINE configs[4]):
    100 detector objects (S padded 100->104 inside the kernel),
    netLength=16, per-example kb_lengths spanning the full 1..100 range —
    through the fused serving kernel AND the fused train pair, against
    the XLA path.  Feature dims are reduced to keep CPU interpret-mode
    runtime sane; the full 2048-dim/512-mem point is measured on-chip by
    bench.py's gqa section."""
    from tests.test_fused_train import (assert_grads_close, det_cfg,
                                        make_model_gqa_batch)
    from mac_network_tpu.ops.pallas import (FusedTrainEngine,
                                            supports_fused_train)
    # every dropout off: the fused train kernels draw masks from an
    # in-kernel RNG, so grad parity vs XLA is exact only deterministically
    cfg = det_cfg(dataset="GQA", imageDims=[1, 100, 48],
                  stemNumLayers=1, stemKernelSize=1, netLength=16,
                  writeGate=True)
    assert supports_fused_config(cfg) and supports_fused_train(cfg)
    n_obj = jnp.asarray([1, 7, 100, 33, 52, 99, 64, 100], jnp.int32)
    model, emb, variables, qs, lens, imgs = make_model_gqa_batch(
        cfg, 8, n_obj)

    # serving parity at S=100, T=16
    expected, _ = model.apply(variables, qs, lens, imgs, train=False,
                              kb_lengths=n_obj)
    engine = FusedMACEngine(cfg, emb, batch_tile=8)
    got = engine(variables, qs, lens, imgs, interpret=True,
                 kb_lengths=n_obj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=5e-4, atol=5e-4)

    # train-grad parity at the same geometry
    engine_t = FusedTrainEngine(cfg, emb, batch_tile=8)

    def loss(apply_fn):
        def f(p):
            lg, _ = apply_fn({"params": p}, qs, lens, imgs, train=True,
                             rngs={"dropout": jax.random.key(3)},
                             kb_lengths=n_obj)
            return jnp.mean(lg ** 2)
        return f

    g_xla = jax.grad(loss(model.apply))(variables["params"])
    g_fused = jax.grad(loss(engine_t.apply))(variables["params"])
    assert_grads_close(g_xla, g_fused)
