"""TF1 checkpoint importer: reference-trained weights -> Flax/orbax.

The reference trains with TF1 ``tf.train.Saver`` checkpoints
(reference: main.py:163-201); its variable names come from the nested
``tf.variable_scope`` layout in model.py / mac_cell.py / ops.py
(``macModel/MACnetwork/MACCell/read/linearLayermemKbProj/weights/weight``
and so on).  This module maps that namespace onto this framework's Flax
parameter tree so reference-trained models can be served/finetuned here —
and so logits can be compared *directly* across the two implementations.

Input format: a ``{tf_variable_name: np.ndarray}`` mapping (or an .npz
file of the same).  TensorFlow is not required on this side; to produce
the .npz from a reference checkpoint run, on any machine with TF1::

    reader = tf.train.load_checkpoint("weights/expName/weights25.ckpt")
    np.savez("ckpt.npz", **{n: reader.get_tensor(n)
                            for n in reader.get_variable_to_shape_map()})

Weight-layout facts that make the import a pure rename (no transposes):
  * ``ops.linear`` computes x @ W with W stored [inDim, outDim]
    (reference: ops.py:304, 329-339) — same layout as ops/linear.Linear.
  * conv kernels are HWIO (reference: ops.py:390, tf.nn.conv2d) — same as
    flax nn.Conv.
  * TF BasicLSTMCell stores one kernel [(in+h), 4h] with gate order
    i, j, f, o and a zero bias (forget_bias added at run time) — exactly
    ops/rnn.LSTMCell's ``kernel_w`` / ``kernel_b``.
  * the act-layer quirk (ops.py:325-328) nests a second linear as
    ``linearLayer{name}_2`` inside ``linearLayer{name}`` — mirrored by the
    ``linear_2`` submodule here.

Supported surface: the shipped configs/args*.txt variant matrix (LSTM
encoder, encBi) plus the optional flags each touches (unsharedCells,
write gate/self-attention, answer embeddings, initKBwithQ, null word).
Any parameter the map cannot name raises, listing the leftover paths.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

from mac_network_tpu.config import Config

EMA_SUFFIX = "/ExponentialMovingAverage"

# TF optimizer/bookkeeping slots that legitimately have no Flax counterpart
_SKIP_MARKERS = ("/Adam", "beta1_power", "beta2_power", "global_step")


def _linear(tf_scope: str, tf_name: str, flax_path: Tuple[str, ...],
            out: Dict[str, Tuple[str, ...]], act_layer: bool = False):
    """Map one reference ops.linear: weights/weight + biases/bias under
    ``{tf_scope}/linearLayer{tf_name}``, plus the nested act-layer copy."""
    base = f"{tf_scope}/linearLayer{tf_name}"
    out[f"{base}/weights/weight"] = flax_path + ("weight",)
    out[f"{base}/biases/bias"] = flax_path + ("bias",)
    if act_layer:
        nested = f"{base}/linearLayer{tf_name}_2"
        out[f"{nested}/weights/weight"] = flax_path + ("linear_2", "weight")
        out[f"{nested}/biases/bias"] = flax_path + ("linear_2", "bias")


def _inter2logits(tf_scope: str, flax_path: Tuple[str, ...],
                  out: Dict[str, Tuple[str, ...]]):
    """ops.inter2logits (reference: ops.py:114-120): a scalar-output linear
    named 'logits' inside an 'inter2logits' scope."""
    _linear(f"{tf_scope}/inter2logits", "logits", flax_path + ("logits",), out)


def _cell_map(cfg: Config, cell_path: Tuple[str, ...], suffix: str,
              out: Dict[str, Tuple[str, ...]]):
    """One MAC cell's control/read/write parameters.  ``suffix`` is the
    reference's per-step cell name ('' shared, str(i) for unsharedCells —
    reference: mac_cell.py:434-438)."""
    mc = "macModel/MACnetwork/MACCell"

    # ---- control unit (reference: mac_cell.py:133-187)
    ctrl = f"{mc}/control{suffix}"
    cpath = cell_path + ("control",)
    if cfg.controlFeedPrev:
        _linear(ctrl, "contControl", cpath + ("contControl",), out,
                act_layer=cfg.controlContAct != "NON")
    if cfg.controlProj:
        _linear(ctrl, "", cpath + ("proj",), out,
                act_layer=cfg.controlProjAct != "NON")
    _inter2logits(ctrl, cpath + ("inter2logits",), out)

    # ---- read unit (reference: mac_cell.py:209-277)
    read = f"{mc}/read{suffix}"
    rpath = cell_path + ("read",)
    if cfg.readProjInputs:
        if cfg.readProjShared:
            _linear(f"{read}/mulmemInter", "proj", rpath + ("proj",), out)
        else:
            _linear(f"{read}/mulmemInter", "projX", rpath + ("projX",), out)
            _linear(f"{read}/mulmemInter", "projY", rpath + ("projY",), out)
    if cfg.readMemAttType in ("DIAG", "BL"):
        out[f"{read}/mulmemInter/weights/weight"] = rpath + ("memInterW",)
        out[f"{read}/mulmemInter/biases/bias"] = rpath + ("memInterB",)
    if cfg.readMemProj:
        _linear(read, "memKbProj", rpath + ("memKbProj",), out,
                act_layer=cfg.readMemAct != "NON")
    if cfg.readCtrl:
        inter_dim = cfg.attDim if cfg.readProjInputs else cfg.memDim
        if cfg.readMemConcatKB and not cfg.readMemProj:
            inter_dim += (cfg.attDim if cfg.readMemConcatProj else cfg.memDim)
        if cfg.ctrlDim != inter_dim:
            _linear(read, "ctrlProj", rpath + ("ctrlProj",), out)
        if cfg.readCtrlAttType in ("DIAG", "BL"):
            out[f"{read}/mulctrlInter/weights/weight"] = rpath + ("ctrlInterW",)
            out[f"{read}/mulctrlInter/biases/bias"] = rpath + ("ctrlInterB",)
    _inter2logits(f"{read}/inter2att", rpath + ("inter2logits",), out)

    # ---- write unit (reference: mac_cell.py:305-375)
    write = f"{mc}/write{suffix}"
    wpath = cell_path + ("write",)
    if cfg.writeInfoProj:
        _linear(write, "info", wpath + ("info",), out)
    if cfg.writeSelfAtt:
        _linear(write, "ctrlProj", wpath + ("ctrlProj",), out)
        _inter2logits(f"{write}/inter2attselfAttention",
                      wpath + ("selfAttention",), out)
    d = cfg.memDim
    write_dim = d
    if cfg.writeInputs == "BOTH":
        write_dim = 3 * d if cfg.writeConcatMul else 2 * d
    if cfg.writeSelfAtt:
        write_dim += d
    if cfg.writeMergeCtrl:
        write_dim += d
    if cfg.writeMemProj or write_dim != d:
        _linear(write, "newMemory", wpath + ("newMemory",), out,
                act_layer=False)
    if cfg.writeGate:
        _linear(write, "gate", wpath + ("gate",), out)


def tf1_name_map(cfg: Config,
                 num_rnn_layers: Optional[int] = None,
                 num_fc_layers: Optional[int] = None
                 ) -> Dict[str, Tuple[str, ...]]:
    """Full map: reference TF1 variable name -> Flax param-tree path, for
    the model shaped by ``cfg``.  Raises for config corners the importer
    does not cover (non-LSTM encoders, baselines)."""
    if cfg.useBaseline:
        raise NotImplementedError("TF1 import covers the MAC model only")
    if cfg.encType != "LSTM" or not cfg.encBi:
        raise NotImplementedError(
            "TF1 import covers the bi-LSTM encoder (the shipped arg files); "
            f"got encType={cfg.encType} encBi={cfg.encBi}")
    if cfg.autoEncMem:
        raise NotImplementedError(
            "autoEncMem params cannot appear in reference checkpoints "
            "(its call site is commented out, reference mac_cell.py:468)")

    out: Dict[str, Tuple[str, ...]] = {}

    # ---- embeddings (reference: model.py:205-249)
    out["macModel/qEmbeddings/emb"] = ("qEmbeddings", "emb")
    if cfg.ansEmbMod == "BOTH":
        out["macModel/aEmbeddings/emb"] = ("qEmbeddings", "aEmb")

    # ---- encoder (reference: model.py:279-307; ops.biRNNLayer 859-911)
    enc = "macModel/encoder"
    for i in range(num_rnn_layers or cfg.encNumLayers):
        for d in ("fw", "bw"):
            tf_cell = (f"{enc}/birnnLayerrnn{i}/bidirectional_rnn/{d}/"
                       "basic_lstm_cell")
            flax_cell = ("qEmbeddings", f"rnn{i}", d, "scan", "cell")
            out[f"{tf_cell}/kernel"] = flax_cell + ("kernel_w",)
            out[f"{tf_cell}/bias"] = flax_cell + ("kernel_b",)
    if (cfg.encDim != cfg.ctrlDim) or cfg.encProj:
        _linear(enc, "projCW", ("qEmbeddings", "projCW"), out)
        _linear(enc, "projQ", ("qEmbeddings", "projQ"), out,
                act_layer=cfg.encProjQAct != "NON")

    # ---- stem (reference: model.py:165-204)
    if cfg.stemLinear:
        _linear("macModel/stem", "", ("stem", "linearStem"), out)
    else:
        for i in range(cfg.stemNumLayers):
            base = f"macModel/stem/cnnLayercnn_{i}"
            flax = ("stem", "cnn", f"cnn_{i}", "conv")
            out[f"{base}/kernels/kernel"] = flax + ("kernel",)
            out[f"{base}/biases/bias"] = flax + ("bias",)

    # ---- MAC recurrence (reference: model.py:428-489, mac_cell.py)
    mac = "macModel/MACnetwork"
    mc = f"{mac}/MACCell"
    _linear(mc, "qInput", ("mac", "qInput"), out)
    if cfg.controlInputUnshared:
        for i in range(cfg.netLength):
            _linear(mc, f"qInput{i}", ("mac", f"qInput{i}"), out)
    else:
        _linear(mc, "qInputU", ("mac", "qInputU"), out)
    # zero_state-created parameters live directly under MACnetwork
    # (reference: model.py:447 calls zero_state inside that scope)
    if cfg.initCtrl == "PRM":
        out[f"{mac}/initCtrl"] = ("mac", "initCtrl")
    if cfg.initMem == "PRM":
        out[f"{mac}/initMem"] = ("mac", "initMem")
    if cfg.addNullWord:
        out[f"{mac}/zeroWord"] = ("mac", "zeroWord")
    if cfg.initKBwithQ != "NON":
        _linear(mac, "questions", ("mac", "questions"), out)
        _linear(mac, "initKB", ("mac", "initKB"), out)
    if cfg.controlInWordsProj or cfg.controlOutWordsProj:
        _linear(mac, "wordsProj", ("mac", "wordsProj"), out)

    if cfg.unsharedCells:
        for i in range(cfg.netLength):
            _cell_map(cfg, ("mac", f"cell{i}"), str(i), out)
    else:
        _cell_map(cfg, ("mac", "cell"), "", out)

    # ---- output unit + classifier (reference: model.py:512-576)
    if cfg.outQuestion:
        _linear("macModel/outputUnit", "outQuestion",
                ("output", "outQuestion"), out)
    if cfg.outImage:
        _linear("macModel/outputUnit", "outImage", ("output", "outImage"),
                out)
    n_fc = num_fc_layers or (len(cfg.outClassifierDims) + 1)
    for i in range(n_fc):
        _linear("macModel/classifier", f"fc_{i}",
                ("classifier", "fc", f"fc_{i}"), out)
    if cfg.answerMod != "NON":
        out["macModel/classifier/biases/biasans"] = ("classifier", "ansBias")

    return out


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _set_path(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_tf1_params(cfg: Config, tf_vars: Mapping[str, np.ndarray],
                      params: Any, ema: bool = False) -> Any:
    """Build a new Flax param tree with every leaf taken from the TF1
    variable mapping.  ``ema=True`` reads the shadow variables the
    reference's EMA saver writes (reference: model.py:658-667 —
    ``<name>/ExponentialMovingAverage``).

    Checks both directions: every Flax leaf must be found (with matching
    shape), and every non-optimizer TF variable must be consumed.
    """
    name_map = tf1_name_map(cfg)
    flat = _flatten(params)

    path_to_tf = {path: tf for tf, path in name_map.items()}
    new_tree: Dict = {}
    missing: List[str] = []
    used = set()
    for path, leaf in flat.items():
        tf_name = path_to_tf.get(path)
        if tf_name is None:
            missing.append("/".join(path) + " (no TF1 name for this param)")
            continue
        if ema:
            tf_name = tf_name + EMA_SUFFIX
        if tf_name not in tf_vars:
            missing.append("/".join(path) + f" (checkpoint lacks {tf_name})")
            continue
        value = np.asarray(tf_vars[tf_name])
        if tuple(value.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {tf_name}: checkpoint "
                f"{tuple(value.shape)} vs model {tuple(np.shape(leaf))}")
        _set_path(new_tree, path, value.astype(np.float32))
        used.add(tf_name)
    if missing:
        raise ValueError("TF1 import incomplete:\n  " + "\n  ".join(missing))

    leftovers = [n for n in tf_vars
                 if n not in used
                 and not n.endswith(EMA_SUFFIX)
                 and not any(m in n for m in _SKIP_MARKERS)]
    if leftovers and not ema:
        raise ValueError(
            "TF1 checkpoint has unmapped model variables (config mismatch?):"
            "\n  " + "\n  ".join(sorted(leftovers)[:20]))
    return new_tree


def load_tf1_npz(path: str) -> Dict[str, np.ndarray]:
    """Read a ``{tf_name: array}`` .npz produced from a TF1 checkpoint (see
    module docstring for the one-liner)."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def import_checkpoint(cfg: Config, npz_path: str, state,
                      use_ema: Optional[bool] = None):
    """TrainState with params (and EMA params, when present in the
    checkpoint) replaced by the reference-trained weights."""
    tf_vars = load_tf1_npz(npz_path)
    params = import_tf1_params(cfg, tf_vars, state.params)
    ema = state.ema_params
    has_ema = any(n.endswith(EMA_SUFFIX) for n in tf_vars)
    if use_ema is None:
        use_ema = has_ema and ema is not None
    if use_ema:
        ema = import_tf1_params(cfg, tf_vars, state.params, ema=True)
    elif ema is not None:
        ema = params
    import jax
    import jax.numpy as jnp
    as_jnp = lambda t: None if t is None else jax.tree.map(jnp.asarray, t)
    return state.replace(params=as_jnp(params), ema_params=as_jnp(ema))
