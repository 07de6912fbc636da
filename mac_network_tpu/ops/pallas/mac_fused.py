"""Fused Pallas kernel for the netLength MAC recurrence (inference).

The device hot loop (SURVEY.md §3.3) is netLength repetitions of
control-attention over <=L question words, read-attention over the S=H*W
knowledge-base cells, and the write update.  The XLA path streams the
[B, S, d] interaction tensors through HBM every step; this kernel instead:

  * tiles the batch (grid over B/Bt) and keeps the KB tile, the projected
    KB tile and all cell weights resident in VMEM across ALL netLength
    steps — the KB is read from HBM once per example instead of once per
    step per tensor;
  * hoists the step-invariant half of the read unit's first projection:
    concat(inter, kbProj) @ W1 == inter @ W1a + kbProj @ W1b, and
    kbProj @ W1b is the same every step at eval — computed once per tile
    (the XLA unrolled loop re-does this 1/3 of the read FLOPs each step);
  * runs every matmul on the MXU in bf16 with f32 accumulation and the two
    softmaxes in f32.

Supported config envelope (``supports_fused_config``): the shipped
args/args2/args4 variants — non-recurrent control, MUL interactions,
readMemConcatKB+Proj, readMemProj (with the act-layer second linear),
readCtrl, write BOTH + memory projection, optional write gate.  Everything
else falls back to the XLA path (mac_network.MACRecurrence).

This is an inference/serving engine; training keeps the XLA path (fresh
per-step dropout breaks the hoists — mac_cell.ReadUnit docstring).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mac_network_tpu.config import Config

NEG_INF = -1e30


def supports_fused_config(cfg: Config) -> bool:
    """The flag combination the fused kernel implements exactly."""
    return (
        cfg.readProjInputs and not cfg.readProjShared
        and cfg.readMemAttType == "MUL" and cfg.readMemConcatKB
        and cfg.readMemConcatProj and cfg.readMemProj
        and cfg.readMemAct == "RELU"
        and cfg.readCtrl and cfg.readCtrlAttType == "MUL"
        and not cfg.readCtrlConcatKB and not cfg.readCtrlConcatInter
        and cfg.readCtrlAct == "RELU" and not cfg.readSmryKBProj
        and not cfg.controlFeedPrev and not cfg.controlConcatWords
        and not cfg.controlProj and not cfg.controlContinuous
        and not cfg.controlWholeQ
        and not cfg.controlInWordsProj and not cfg.controlOutWordsProj
        and cfg.writeInputs == "BOTH" and not cfg.writeConcatMul
        and not cfg.writeSelfAtt and not cfg.writeMergeCtrl
        and not cfg.writeInfoProj and cfg.writeInfoAct == "NON"
        and cfg.writeMemAct == "NON" and not cfg.memoryBN
        and not cfg.unsharedCells and cfg.initKBwithQ == "NON"
        and not cfg.addNullWord and cfg.relu in ("ELU", "STD")
        and cfg.mulBias == 0.0
    )


def _act(x, kind: str):
    # Mosaic on this target has no bf16 compare and no expm1 lowering, so
    # ELU is written compare-free:  elu(x) = max(x,0) + exp(min(x,0)) - 1
    # (for x>0 the exp term is exp(0)-1 = 0; for x<=0 the max term is 0).
    # Stays in the input dtype — no f32 temporaries live across the matmuls.
    if kind == "ELU":
        one = jnp.asarray(1.0, x.dtype)
        zero = jnp.asarray(0.0, x.dtype)
        return jnp.maximum(x, zero) + jnp.exp(jnp.minimum(x, zero)) - one
    return jnp.maximum(x, jnp.asarray(0.0, x.dtype))


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_lowp(a, b):
    """Matmul with f32 accumulation (Mosaic requires a 32-bit acc) cast
    straight back to the input dtype."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def _mac_kernel(T: int, relu_kind: str, use_gate: bool, gate_shared: bool,
                gate_bias: float,
                # refs (order must match the pallas_call below)
                kb_ref, kbp_ref, words_ref, mask_ref, ci_ref,
                ctrl0_ref, mem0_ref,
                wq_ref, bq_ref, wmem_ref, bmem_ref,
                w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
                wr_ref, br_ref, w3m_ref, w3i_ref, b3_ref,
                wg_ref, bg_ref,
                out_ref):
    """One batch tile, all T reasoning steps."""
    Bt, S, d = kb_ref.shape
    L = words_ref.shape[1]
    dtype = kb_ref.dtype

    kb = kb_ref[...]                      # [Bt, S, d]
    kbp = kbp_ref[...]
    words = words_ref[...]                # [Bt, L, d]
    mask = mask_ref[...]                  # [Bt, L] additive f32 mask
    memory = mem0_ref[...]
    control = ctrl0_ref[...]

    kbp2 = kbp.reshape(Bt * S, d)
    # hoist: step-invariant half of the read projection (+ its bias)
    kbW1b = _dot_lowp(kbp2, w1b_ref[...]) + b1_ref[...].astype(dtype)

    wq = wq_ref[...]                      # [d] control-logits vector weight
    wr = wr_ref[...]
    bq = bq_ref[0, 0]
    br = br_ref[0, 0]

    def step(t, carry):
        control, memory = carry
        ci = ci_ref[t]                    # [Bt, d]

        # ---- control unit: attention over question words
        inter = ci[:, None, :] * words                       # [Bt, L, d]
        qlog = jnp.sum(inter * wq[None, None, :], axis=-1)
        qlog = qlog.astype(jnp.float32) + bq + mask
        qatt = _softmax_f32(qlog).astype(dtype)
        control = jnp.sum(qatt[:, :, None] * words, axis=1).astype(dtype)

        # ---- read unit
        y = (_dot(memory, wmem_ref[...]) + bmem_ref[...]).astype(dtype)
        inter2 = kbp * y[:, None, :]                         # [Bt, S, d]
        h = _dot_lowp(inter2.reshape(Bt * S, d), w1a_ref[...]) + kbW1b
        h = _act(h, relu_kind)
        h = _dot_lowp(h, w2_ref[...]) + b2_ref[...].astype(dtype)  # act-layer
        e = _act(h.reshape(Bt, S, d) * control[:, None, :], relu_kind)
        rlog = jnp.sum(e * wr[None, None, :], axis=-1).astype(jnp.float32) + br
        ratt = _softmax_f32(rlog).astype(dtype)
        info = jnp.sum(ratt[:, :, None] * kb, axis=1).astype(dtype)

        # ---- write unit: concat(mem, info) @ W3 via split halves
        new_mem = (_dot(memory, w3m_ref[...]) + _dot(info, w3i_ref[...])
                   + b3_ref[...]).astype(dtype)
        if use_gate:
            z = jax.nn.sigmoid(
                (_dot(control, wg_ref[...]) + bg_ref[...]
                 + gate_bias).astype(jnp.float32)).astype(dtype)
            new_mem = new_mem * z + memory * (1.0 - z)
        return control, new_mem

    control, memory = jax.lax.fori_loop(0, T, step, (control, memory))
    out_ref[...] = memory


def fused_mac_steps(cfg: Config, weights: Dict[str, jnp.ndarray],
                    kb, kb_proj, words, lengths, control_inputs,
                    init_control, init_memory,
                    batch_tile: int = 8,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Run the full netLength recurrence as one Pallas kernel.

    kb, kb_proj: [B, S, d]; words: [B, L, d]; lengths: [B];
    control_inputs: [T, B, d]; init_*: [B, d].  Returns final memory [B, d].
    """
    B, S, d = kb.shape
    T = cfg.netLength
    L = words.shape[1]

    # large batches run as chunks of <=256: per-call VMEM accounting on this
    # toolchain grows with the total array sizes and overflows past that
    if B > 256 and B % 256 == 0:
        n = B // 256
        chunk = lambda x, ax=0: x.reshape((n, 256) + x.shape[1:]) \
            if ax == 0 else x.reshape(x.shape[:1] + (n, 256) + x.shape[2:])
        ci = control_inputs.reshape(T, n, 256, -1).transpose(1, 0, 2, 3)
        outs = jax.lax.map(
            lambda args: fused_mac_steps(
                cfg, weights, args[0], args[1], args[2], args[3],
                args[4].transpose(1, 0, 2), args[5], args[6],
                batch_tile=batch_tile, interpret=interpret),
            (chunk(kb), chunk(kb_proj), chunk(words), chunk(lengths),
             ci, chunk(init_control), chunk(init_memory)))
        return outs.reshape(B, d)

    Bt = batch_tile
    while B % Bt:
        Bt //= 2
    # TPU lowering: 2-D block sublane dim must be a multiple of 8
    Bt = max(Bt, 8) if B % 8 == 0 else B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mask = jnp.where(jnp.arange(L)[None, :] < lengths[:, None],
                     0.0, NEG_INF).astype(jnp.float32)          # [B, L]

    dtype = kb.dtype
    w = {k: v.astype(dtype) for k, v in weights.items()
         if k not in ("bq", "br")}
    bq = weights["bq"].reshape(1, 1).astype(jnp.float32)
    br = weights["br"].reshape(1, 1).astype(jnp.float32)

    use_gate = cfg.writeGate
    wg = w.get("wg", jnp.zeros((d, 1), dtype))
    bg = w.get("bg", jnp.zeros((1,), dtype))

    kernel = functools.partial(
        _mac_kernel, T, cfg.relu, use_gate, cfg.writeGateShared,
        float(cfg.writeGateBias))

    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B // Bt,),
        in_specs=[
            tile(Bt, S, d),                                    # kb
            tile(Bt, S, d),                                    # kb_proj
            tile(Bt, L, d),                                    # words
            tile(Bt, L),                                       # mask
            pl.BlockSpec((T, Bt, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),             # control_inputs
            tile(Bt, d),                                       # ctrl0
            tile(Bt, d),                                       # mem0
            full(), pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # wq, bq
            full(), full(),                                    # wmem, bmem
            full(), full(), full(), full(), full(),            # w1a w1b b1 w2 b2
            full(), pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # wr, br
            full(), full(), full(),                            # w3m w3i b3
            full(), full(),                                    # wg bg
        ],
        out_specs=tile(Bt, d),
    )

    flops_per_tile = T * (Bt * S * d * d * 2 * 2 + Bt * d * d * 2 * 3)
    # "arbitrary" grid semantics: no input double-buffering — each tile runs
    # all T reasoning steps, so compute dwarfs the DMA and the saved ~3.5MB
    # of VMEM keeps larger batch tiles under the 16MB budget
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * (B // Bt),
            bytes_accessed=B * S * d * 2 * 2,
            transcendentals=T * B * (S + L)),
    )(kb, kb_proj, words, mask, control_inputs,
      init_control, init_memory,
      w["wq"], bq, w["wmem"], w["bmem"],
      w["w1a"], w["w1b"], w["b1"], w["w2"], w["b2"],
      w["wr"], br, w["w3m"], w["w3i"], w["b3"],
      wg, bg)
    return out


# ---------------------------------------------------------------- engine

def extract_mac_weights(cfg: Config, params: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Pull the cell weights the kernel needs out of the Flax param tree
    (names as created by models.mac_cell / models.mac_network)."""
    mac = params["mac"]
    cell = mac["cell"]
    read = cell["read"]
    d = cfg.memDim

    w1 = read["memKbProj"]["weight"]          # [2d, d]
    out = {
        "wq": cell["control"]["inter2logits"]["logits"]["weight"],
        "bq": cell["control"]["inter2logits"]["logits"]["bias"],
        "wmem": read["projY"]["weight"],
        "bmem": read["projY"]["bias"],
        "w1a": w1[:d], "w1b": w1[d:], "b1": read["memKbProj"]["bias"],
        "w2": read["memKbProj"]["linear_2"]["weight"],
        "b2": read["memKbProj"]["linear_2"]["bias"],
        "wr": read["inter2logits"]["logits"]["weight"],
        "br": read["inter2logits"]["logits"]["bias"],
        "w3m": cell["write"]["newMemory"]["weight"][:d],
        "w3i": cell["write"]["newMemory"]["weight"][d:],
        "b3": cell["write"]["newMemory"]["bias"],
    }
    if cfg.writeGate:
        gw = cell["write"]["gate"]["weight"]
        gb = cell["write"]["gate"]["bias"]
        if cfg.writeGateShared:                     # vector weight, scalar b
            gw = gw[:, None]
            gb = gb.reshape(1)
        out["wg"] = gw
        out["bg"] = gb
    return out


class FusedMACEngine:
    """Serving-path forward: XLA for embeddings/encoder/stem/output, the
    fused Pallas kernel for the netLength recurrence.

    Produces logits identical (within bf16 tolerance) to
    ``MACNetwork.apply(train=False)`` for supported configs.
    """

    def __init__(self, cfg: Config, embedding_init, batch_tile: int = 8):
        from mac_network_tpu.models.mac_network import (
            QuestionEncoder, Stem, OutputUnit, Classifier)
        assert supports_fused_config(cfg), \
            "config outside the fused-kernel envelope; use the XLA path"
        self.cfg = cfg
        self.batch_tile = batch_tile
        self.encoder = QuestionEncoder(cfg, embedding_init)
        self.stem = Stem(cfg)
        self.output = OutputUnit(cfg)
        self.classifier = Classifier(cfg)

    def __call__(self, variables: Dict[str, Any], question_ids, lengths,
                 images, interpret: Optional[bool] = None):
        cfg = self.cfg
        params = variables["params"]
        dtype = jnp.bfloat16 if cfg.computeDtype == "bfloat16" else jnp.float32
        images = images.astype(dtype)

        words_emb, cntx, vec_q, a_emb = self.encoder.apply(
            {"params": params["qEmbeddings"]}, question_ids, lengths,
            train=False)
        kb = self.stem.apply({"params": params["stem"]}, images, train=False)

        mac = params["mac"]
        B = vec_q.shape[0]

        # per-step control inputs: qInput -> act -> per-step projection
        # (mirrors MACRecurrence; reference mac_cell.py:442-448)
        shared = _apply_linear(vec_q, mac["qInput"])
        shared = jnp.tanh(shared) if cfg.controlInputAct == "TANH" else (
            _act(shared, cfg.relu) if cfg.controlInputAct == "RELU" else shared)
        cis = []
        for i in range(cfg.netLength):
            key = f"qInput{i}" if cfg.controlInputUnshared else "qInputU"
            cis.append(_apply_linear(shared, mac[key]))
        control_inputs = jnp.stack(cis, axis=0)

        words = cntx if cfg.controlContextual else words_emb

        # init states (reference: mac_cell.py:496-505)
        def init_state(kind, prm_key, dim):
            if kind == "PRM":
                return jnp.broadcast_to(
                    mac[prm_key].astype(dtype)[None], (B, dim))
            if kind == "ZERO":
                return jnp.zeros((B, dim), dtype)
            return vec_q
        ctrl0 = init_state(cfg.initCtrl, "initCtrl", cfg.ctrlDim)
        mem0 = init_state(cfg.initMem, "initMem", cfg.memDim)

        kb_proj = _apply_linear(kb, mac["cell"]["read"]["projX"])
        weights = extract_mac_weights(cfg, params)

        final_memory = fused_mac_steps(
            cfg, weights, kb, kb_proj, words, lengths, control_inputs,
            ctrl0, mem0, batch_tile=self.batch_tile, interpret=interpret)

        features = self.output.apply({"params": params["output"]},
                                     final_memory, vec_q, images, train=False)
        logits = self.classifier.apply({"params": params["classifier"]},
                                       features, a_emb, train=False)
        return logits


def _apply_linear(x, p):
    w = p["weight"].astype(x.dtype)
    b = p["bias"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b
