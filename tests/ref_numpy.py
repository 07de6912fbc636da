"""Independent pure-numpy reimplementation of the reference's eval-time
forward graph (round-2 VERDICT missing #1 / next-round #2).

THIS MODULE IS WRITTEN FROM /root/reference's TF1 CODE, NOT FROM
mac_network_tpu — it is the cross-implementation check that the two
codebases cannot share a misreading.  Every function cites the reference
lines it transcribes, consumes weights by their TF1 VARIABLE NAMES
(exactly what a `tf.train.load_checkpoint` dump provides), and uses only
numpy.  Nothing here imports mac_network_tpu model/ops code; the test
harness (test_ref_numpy.py) bridges param trees through
train.tf1_import.tf1_name_map, which is pure renaming.

Scope: the shipped configs/args*.txt variant envelope at EVAL time (all
keep-probs fed 1.0, reference model.py:118-125) — bi-LSTM encoder, conv
stem, MAC recurrence with controlFeedPrev / writeSelfAtt / writeGate
branches, output unit + classifier.  Flags outside the envelope raise
NotImplementedError so nothing silently mismatches.

Computation is float64 throughout: an independent high-precision anchor
the f32 implementations are compared against.
"""

import numpy as np

INF = 1e30  # reference: ops.py:10


class TFVars:
    """TF1-name -> array accessor that records which variables were read,
    so the test can assert full consumption (nothing silently unused)."""

    def __init__(self, tf_vars):
        self.v = dict(tf_vars)
        self.used = set()

    def __call__(self, name):
        if name not in self.v:
            raise KeyError(f"reference graph expects variable {name!r}")
        self.used.add(name)
        return np.asarray(self.v[name], np.float64)

    def unused(self):
        return sorted(set(self.v) - self.used)


# ------------------------------------------------------------ activations

def _relu_variant(x, relu_kind, relu_alpha):
    # reference: ops.py:161-179 (PRM needs a variable; out of envelope)
    if relu_kind == "ELU":
        return np.where(x > 0, x, np.expm1(x))
    if relu_kind == "LKY":
        return np.maximum(x, relu_alpha * x)
    if relu_kind == "STD":
        return np.maximum(x, 0.0)
    raise NotImplementedError(f"relu variant {relu_kind}")


def activation(kind, x, cfg):
    # reference: ops.py:181-187 ("RELU" routes through the relu variant)
    if kind == "NON":
        return x
    if kind == "TANH":
        return np.tanh(x)
    if kind == "SIGMOID":
        return 1.0 / (1.0 + np.exp(-x))
    if kind == "RELU":
        return _relu_variant(x, cfg.relu, getattr(cfg, "reluAlpha", 0.2))
    if kind == "ELU":
        return np.where(x > 0, x, np.expm1(x))
    raise NotImplementedError(f"activation {kind}")


def softmax(logits, axis=-1):
    m = logits.max(axis=axis, keepdims=True)
    e = np.exp(logits - m)
    return e / e.sum(axis=axis, keepdims=True)


def exp_mask(seq, lengths):
    # reference: ops.py:243-247 — additive (1 - mask) * (-inf)
    max_len = seq.shape[-1]
    mask = (np.arange(max_len)[None, :] < np.asarray(lengths)[:, None])
    return seq + (1.0 - mask.astype(np.float64)) * (-INF)


# ----------------------------------------------------------------- linear

def linear(p, scope, name, x, cfg, act="NON", act_layer=True, bias=0.0,
           out_rank1=False):
    """reference: ops.py:298-333.  W is [inDim, outDim] ([inDim] when
    outDim == 1, with a scalar bias); when ``act != NON`` and actLayer, a
    SECOND stacked linear (act NON) runs inside the same scope, named
    ``linearLayer{name}_2`` (the reference quirk, ops.py:325-328).
    ``bias`` is the reference's init offset (zeros + bias)."""
    base = f"{scope}/linearLayer{name}"
    W = p(f"{base}/weights/weight")
    b = p(f"{base}/biases/bias") + bias
    if out_rank1:
        out = (x * W).sum(axis=-1) + b        # ops.py:335-339 outDim == 1
    else:
        out = x @ W + b
    out = activation(act, out, cfg)
    if act != "NON" and act_layer:
        out = linear(p, base, f"{name}_2", out, cfg, act="NON",
                     act_layer=False)
    return out


def inter2logits(p, scope, interactions, cfg):
    # reference: ops.py:114-120 — sumMod LIN: rank-1 linear named "logits"
    return linear(p, f"{scope}/inter2logits", "logits", interactions, cfg,
                  out_rank1=True)


def inter2att(p, scope, interactions, cfg):
    # reference: ops.py:140-144 — logits then plain softmax (no mask)
    return softmax(inter2logits(p, f"{scope}/inter2att", interactions, cfg))


def att2smry(attention, features):
    # reference: ops.py:149-150
    return (attention[..., None] * features).sum(axis=-2)


def ops_concat(x, y, mul=False, extend_y=False):
    # reference: ops.py:65-78
    if extend_y:
        y = np.broadcast_to(y[..., None, :], x.shape)
    if mul:
        return np.concatenate([x, y, x * y], axis=-1)
    return np.concatenate([x, y], axis=-1)


def ops_mul(p, scope, x, y, cfg, proj=None, inter_mod="MUL", concat=None):
    """reference: ops.py:668-725 (eval: dropouts all 1.0).  x is
    [B, N, d], y is [B, d] (extendY broadcasts y over N)."""
    orig_x = x
    if proj is not None:
        if proj.get("shared"):
            x = linear(p, scope, "proj", x, cfg)
            y = linear(p, scope, "proj", y, cfg)
        else:
            x = linear(p, scope, "projX", x, cfg)
            y = linear(p, scope, "projY", y, cfg)
    proj_x = x
    yb = np.broadcast_to(y[..., None, :], x.shape)   # extendY, ops.py:692-695

    if inter_mod == "MUL":
        mul_bias = cfg.mulBias                       # ops.py:699-701
        output = (x + mul_bias) * (yb + mul_bias)
    elif inter_mod == "DIAG":
        # reference ops.py:703-706 assigns to `activations` and leaves
        # `output` undefined — the flag path crashes in TF1.  Transcribed
        # here as the evidently intended elementwise bilinear
        # x * W * y + b (the same documented fix the framework ships,
        # mac_network_tpu/ops/mul.py module docstring), so the two
        # implementations of the FIXED semantics stay independently
        # cross-checked.
        W = p(f"{scope}/weights/weight")
        b = p(f"{scope}/biases/bias")
        output = x * W * yb + b
    elif inter_mod == "BL":
        W = p(f"{scope}/weights/weight")
        b = p(f"{scope}/biases/bias")
        output = (x @ W) * yb + b                    # ops.py:707-710
    elif inter_mod == "ADD":
        output = np.tanh(x + yb)                     # ops.py:711-712
    else:
        raise NotImplementedError(f"interMod {inter_mod}")

    if concat is not None:
        vals_x = proj_x if concat.get("proj") else orig_x   # ops.py:715
        if concat.get("x"):
            output = np.concatenate([output, vals_x], axis=-1)
    return output


# ------------------------------------------------------------------ LSTM

def _basic_lstm_steps(x, kernel, bias, lengths):
    """TF1 BasicLSTMCell under dynamic_rnn with sequence_length
    (reference: ops.py:798-833, 859-911 use tf.nn.(bidirectional_)
    dynamic_rnn): kernel [(in+h), 4h], gate order i, j, f, o, zero bias
    with forget_bias 1.0 added at run time; beyond each row's length the
    output is zero and the state is carried unchanged."""
    B, L, _ = x.shape
    h_dim = kernel.shape[1] // 4
    h = np.zeros((B, h_dim))
    c = np.zeros((B, h_dim))
    outputs = np.zeros((B, L, h_dim))
    lengths = np.asarray(lengths)
    for t in range(L):
        gates = np.concatenate([x[:, t], h], axis=-1) @ kernel + bias
        i, j, f, o = np.split(gates, 4, axis=-1)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        new_c = c * sig(f + 1.0) + sig(i) * np.tanh(j)
        new_h = np.tanh(new_c) * sig(o)
        alive = (t < lengths)[:, None]
        c = np.where(alive, new_c, c)
        h = np.where(alive, new_h, h)
        outputs[:, t] = np.where(alive, new_h, 0.0)
    return outputs, h


def _reverse_sequence(x, lengths):
    """tf.reverse_sequence along time: each row's first ``length`` steps
    reversed, padding left in place (what bidirectional_dynamic_rnn does
    around the backward cell)."""
    out = np.array(x)
    for b, ln in enumerate(np.asarray(lengths)):
        out[b, :ln] = x[b, :ln][::-1]
    return out


def bi_lstm_layer(p, scope, x, lengths):
    """reference: ops.py:859-911 biRNNLayer (LSTM cells): fw + bw over the
    length-reversed sequence, outputs concat [fw, bw], final state concat
    of the two LSTM h states."""
    fw_base = f"{scope}/bidirectional_rnn/fw/basic_lstm_cell"
    bw_base = f"{scope}/bidirectional_rnn/bw/basic_lstm_cell"
    out_fw, h_fw = _basic_lstm_steps(
        x, p(f"{fw_base}/kernel"), p(f"{fw_base}/bias"), lengths)
    rev = _reverse_sequence(x, lengths)
    out_bw_rev, h_bw = _basic_lstm_steps(
        rev, p(f"{bw_base}/kernel"), p(f"{bw_base}/bias"), lengths)
    out_bw = _reverse_sequence(out_bw_rev, lengths)
    out = np.concatenate([out_fw, out_bw], axis=-1)
    h = np.concatenate([h_fw, h_bw], axis=-1)
    return out, h


# ------------------------------------------------------------------ conv

def conv2d_same(x, kernel, stride=1):
    """tf.nn.conv2d SAME (reference: ops.py:398), odd kernels, stride 1."""
    if stride != 1:
        raise NotImplementedError("stride > 1 out of envelope")
    kh, kw, _, c_out = kernel.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise NotImplementedError("even kernels out of envelope")
    B, H, W, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((B, H, W, c_out))
    for i in range(kh):
        for j in range(kw):
            out += xp[:, i:i + H, j:j + W, :] @ kernel[i, j]
    return out


# ------------------------------------------------------------- model units

def _check_envelope(cfg):
    unsupported = dict(
        useBaseline=False, stemLinear=False, stemBN=False,
        stemGridRnn=False, locationAware=False, encProj=False,
        encVariationalDropout=False, encNumLayers=1, encType="LSTM",
        encBi=True, wrdEmbFixed=False, outImage=False, outputBN=False,
        answerMod="NON", ansEmbMod="NON", addNullWord=False,
        initKBwithQ="NON", controlWholeQ=False, controlContinuous=False,
        controlConcatWords=False, controlProj=False,
        controlInWordsProj=False, controlOutWordsProj=False,
        controlContextual=True, readProjShared=False,
        readCtrlAttType="MUL", readCtrlConcatKB=False,
        readCtrlConcatInter=False, readSmryKBProj=False, readProjInputs=True,
        readMemProj=True, readCtrl=True,
        writeInfoProj=False, writeInfoAct="NON",
        writeMergeCtrl=False, writeMemAct="NON", writeGateShared=False,
        memoryBN=False, unsharedCells=False, autoEncMem=False,
        stemStrideSizes=None,
    )
    # relu variants STD/ELU/LKY are transcribed (_relu_variant); others
    # (PRM needs a trained variable) raise there
    for flag, expected in unsupported.items():
        got = getattr(cfg, flag)
        if got != expected and not (expected is None and not got):
            raise NotImplementedError(
                f"ref_numpy envelope: {flag}={got!r} (expects {expected!r})")
    if cfg.encDim != cfg.ctrlDim:
        raise NotImplementedError("encoder projections out of envelope")


def encoder_forward(p, cfg, questions, lengths):
    """Embeddings + question input unit (reference: model.py:205-307)."""
    emb = p("macModel/qEmbeddings/emb")
    table = np.concatenate(
        [np.zeros((1, emb.shape[1])), emb], axis=0)      # model.py:217
    words = table[np.asarray(questions)]                 # model.py:218
    cntx, vec_q = bi_lstm_layer(
        p, "macModel/encoder/birnnLayerrnn0", words, lengths)
    # projWords/projQuestion condition (model.py:786) is False in the
    # envelope (encDim == ctrlDim, encProj off)
    return words, cntx, vec_q


def stem_forward(p, cfg, images):
    """Image input unit (reference: model.py:165-204 + ops.py:423-438):
    stemNumLayers convs, SAME, activation after EVERY layer."""
    features = images
    for i in range(cfg.stemNumLayers):
        base = f"macModel/stem/cnnLayercnn_{i}"
        features = conv2d_same(features, p(f"{base}/kernels/kernel"))
        features = features + p(f"{base}/biases/bias")
        features = activation("RELU", features, cfg)     # CNNLayer act
    B = features.shape[0]
    return features.reshape(B, -1, cfg.memDim)           # model.py:202


def control_unit(p, scope, cfg, control_input, in_words, out_words,
                 lengths, control, cont_control):
    """reference: mac_cell.py:133-187."""
    new_cont = control_input
    if cfg.controlFeedPrev:
        new_cont = control if cfg.controlFeedPrevAtt else cont_control
        if cfg.controlFeedInputs:
            new_cont = np.concatenate([new_cont, control_input], axis=-1)
        new_cont = linear(p, scope, "contControl", new_cont, cfg,
                          act=cfg.controlContAct)        # mac_cell.py:148-150
    interactions = new_cont[:, None, :] * in_words       # mac_cell.py:155
    logits = inter2logits(p, scope, interactions, cfg)   # mac_cell.py:169
    attention = softmax(exp_mask(logits, lengths))       # mac_cell.py:175
    new_control = att2smry(attention, out_words)         # mac_cell.py:181
    return new_control, new_cont, attention


def read_unit(p, scope, cfg, kb, memory, control):
    """reference: mac_cell.py:209-277 (eval: dropouts 1.0)."""
    proj = {"dim": cfg.attDim, "shared": cfg.readProjShared}
    concat = {"x": cfg.readMemConcatKB, "proj": cfg.readMemConcatProj}
    interactions = ops_mul(p, f"{scope}/mulmemInter", kb, memory, cfg,
                           proj=proj, inter_mod=cfg.readMemAttType,
                           concat=concat)                # mac_cell.py:230
    interactions = linear(p, scope, "memKbProj", interactions, cfg,
                          act=cfg.readMemAct)            # mac_cell.py:237-238
    # readCtrl (ctrlDim == dim in envelope: no ctrlProj)
    interactions = ops_mul(p, f"{scope}/mulctrlInter", interactions,
                           control, cfg, inter_mod=cfg.readCtrlAttType,
                           concat={"x": cfg.readCtrlConcatInter})
    interactions = activation(cfg.readCtrlAct, interactions, cfg)
    attention = inter2att(p, scope, interactions, cfg)   # mac_cell.py:266
    info = att2smry(attention, kb)                       # mac_cell.py:275
    return info, attention


def write_unit(p, scope, cfg, memory, info, control, cont_control,
               prev_controls, prev_memories):
    """reference: mac_cell.py:305-375 (eval).  prev_controls /
    prev_memories are the stacked histories the cell accumulates
    (mac_cell.py:472-474 + zero_state :549-551) — init state plus every
    EARLIER step, the current step not yet appended."""
    if cfg.writeSelfAtt:
        self_control = cont_control if cfg.writeSelfAttMod == "CONT" \
            else control                                 # mac_cell.py:317-320
        self_control = linear(p, scope, "ctrlProj", self_control, cfg)
        interactions = prev_controls * self_control[:, None, :]
        attention = softmax(inter2logits(
            p, f"{scope}/inter2attselfAttention", interactions, cfg))
        self_smry = att2smry(attention, prev_memories)   # mac_cell.py:330
    # write-unit inputs (reference mac_cell.py:332-339)
    if cfg.writeInputs == "INFO":
        new_memory = info
    elif cfg.writeInputs == "SUM":
        new_memory = memory + info
    elif cfg.writeInputs == "BOTH":
        new_memory = ops_concat(memory, info, mul=cfg.writeConcatMul)
    else:                                                # "MEM"
        new_memory = memory
    if cfg.writeSelfAtt:
        new_memory = np.concatenate([new_memory, self_smry], axis=-1)
    new_memory = linear(p, scope, "newMemory", new_memory, cfg)
    if cfg.writeGate:
        z_logits = linear(p, scope, "gate", control, cfg,
                          bias=cfg.writeGateBias)        # mac_cell.py:363
        z = 1.0 / (1.0 + np.exp(-z_logits))
        new_memory = new_memory * z + memory * (1 - z)   # mac_cell.py:367
    return new_memory


def mac_network(p, cfg, kb, vec_q, cntx_words, lengths):
    """reference: model.py:428-489 + mac_cell.py:420-480, 539-592."""
    mac = "macModel/MACnetwork"
    mc = f"{mac}/MACCell"
    B = vec_q.shape[0]

    def init_state(name, dim, kind):                     # mac_cell.py:496-505
        if kind == "PRM":
            return np.broadcast_to(p(f"{mac}/{name}")[None], (B, dim)).copy()
        if kind == "ZERO":
            return np.zeros((B, dim))
        return vec_q

    control = init_state("initCtrl", cfg.ctrlDim, cfg.initCtrl)
    memory = init_state("initMem", cfg.memDim, cfg.initMem)
    controls = control[:, None, :]                       # mac_cell.py:549
    memories = memory[:, None, :]
    cont_control = control                               # mac_cell.py:553
    words = cntx_words                                   # controlContextual

    for i in range(cfg.netLength):                       # model.py:453-458
        # per-step question projection (mac_cell.py:440-448)
        control_input = linear(p, mc, "qInput", vec_q, cfg)
        control_input = activation(cfg.controlInputAct, control_input, cfg)
        step_name = f"qInput{i}" if cfg.controlInputUnshared else "qInputU"
        control_input = linear(p, mc, step_name, control_input, cfg)

        new_control, cont_control, _ = control_unit(
            p, f"{mc}/control", cfg, control_input, words, words,
            lengths, control, cont_control)
        info, _ = read_unit(p, f"{mc}/read", cfg, kb, memory, new_control)
        new_memory = write_unit(p, f"{mc}/write", cfg, memory, info,
                                new_control, cont_control,
                                controls, memories)
        controls = np.concatenate(
            [controls, new_control[:, None, :]], axis=1)  # mac_cell.py:472
        memories = np.concatenate(
            [memories, new_memory[:, None, :]], axis=1)
        control, memory = new_control, new_memory

    return control, memory


def output_classifier(p, cfg, memory, vec_q):
    """reference: model.py:512-576 (outQuestion path, answerMod NON)."""
    features = memory
    if cfg.outQuestion:
        e_vec = linear(p, "macModel/outputUnit", "outQuestion", vec_q, cfg)
        features = ops_concat(features, e_vec, mul=cfg.outQuestionMul)
    # FCLayer (ops.py:349-359): act NON inside linear, RELU between layers
    dims = [None] + list(cfg.outClassifierDims) + [cfg.answerWordsNum]
    n_layers = len(dims) - 1
    for i in range(n_layers):
        features = linear(p, "macModel/classifier", f"fc_{i}", features, cfg)
        if i < n_layers - 1:
            features = activation("RELU", features, cfg)
    return features


def forward(cfg, tf_vars, questions, lengths, images):
    """Full eval forward (reference: model.py:762-829 build order), from
    TF1-named variables.  Returns (logits, unused_variable_names)."""
    _check_envelope(cfg)
    p = TFVars(tf_vars)
    _, cntx, vec_q = encoder_forward(p, cfg, questions, lengths)
    kb = stem_forward(p, cfg, np.asarray(images, np.float64))
    _, memory = mac_network(p, cfg, kb, vec_q, cntx, lengths)
    logits = output_classifier(p, cfg, memory, vec_q)
    return logits, p.unused()
