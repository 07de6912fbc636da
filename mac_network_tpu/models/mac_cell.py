"""The MAC cell: control / read / write units (reference: mac_cell.py).

One reasoning step of the recurrent MAC network (Compositional Attention
Networks for Machine Reasoning, arXiv 1803.03067):

  * ControlUnit — attention over question words produces the step's
    reasoning operation (reference: mac_cell.py:133-187).
  * ReadUnit — two-stage attention over the knowledge base (image cells)
    conditioned on memory then control (reference: mac_cell.py:209-277).
  * WriteUnit — integrates retrieved info into memory, with optional
    self-attention over previous steps and a memory gate
    (reference: mac_cell.py:305-375).

TPU design notes:
  * All per-step tensors are [B, S=H*W, d] / [B, L, d] with static shapes;
    the elementwise interaction chains sit between MXU matmuls and fuse.
  * The KB projection inside the read unit uses the same weights every step
    and, at eval, the same input — so the recurrence driver hoists it out of
    the loop via ``ReadUnit.project_kb`` (same parameters, computed once:
    16 [B*S,d]x[d,d] matmuls become 1).  During training the reference
    draws fresh dropout on the KB each step before projecting (ops.py:678),
    so the projection is recomputed per step for parity.
  * Attention softmaxes run in f32 under bf16 compute.

Deviations from the reference (documented):
  * reference read unit references an undefined ``ctrlDim`` variable when
    ctrlDim != interaction dim (mac_cell.py:246, NameError); implemented
    correctly here.
  * reference ``addNullWord`` uses unbound variables (mac_cell.py:519-524);
    implemented correctly in the recurrence driver.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.activations import Act
from mac_network_tpu.ops.attention import (Inter2Logits, att2smry, exp_mask,
                                           masked_softmax)
from mac_network_tpu.ops.dropout import apply_var_dp_mask
from mac_network_tpu.ops.linear import Linear, _vector_glorot
from mac_network_tpu.ops.mul import Mul


class ControlUnit(nn.Module):
    """New control state = attention-weighted sum of question words
    (reference: mac_cell.py:133-187)."""
    cfg: Config

    @nn.compact
    def __call__(self, control_input, in_words, out_words, lengths,
                 control, cont_control=None, train: bool = False):
        cfg = self.cfg

        # Step 1: continuous control — merge previous control and question
        # (reference: mac_cell.py:142-151)
        new_cont_control = control_input
        if cfg.controlFeedPrev:
            new_cont_control = control if cfg.controlFeedPrevAtt else cont_control
            if cfg.controlFeedInputs:
                new_cont_control = jnp.concatenate(
                    [new_cont_control, control_input], axis=-1)
            new_cont_control = Linear(
                cfg.ctrlDim, cfg, act=cfg.controlContAct,
                name="contControl")(new_cont_control, train)

        # Step 2: attention over words (reference: mac_cell.py:153-181)
        interactions = new_cont_control[:, None, :] * in_words
        if cfg.controlConcatWords:
            interactions = jnp.concatenate([interactions, in_words], axis=-1)
        if cfg.controlProj:
            interactions = Linear(cfg.ctrlDim, cfg, act=cfg.controlProjAct,
                                  name="proj")(interactions, train)

        logits = Inter2Logits(cfg, name="inter2logits")(interactions, train)
        attention = masked_softmax(logits, lengths)
        new_control = att2smry(attention, out_words)

        # ablation: continuous control (reference: mac_cell.py:184-186)
        if cfg.controlContinuous:
            new_control = new_cont_control

        return new_control, new_cont_control, attention


class SplitActLinear(nn.Module):
    """Linear + activation + stacked act-layer (same semantics and the same
    parameter tree as ``Linear(features, act=..)``: weight, bias, act,
    linear_2) but with the first matmul exposed in two halves, so the
    step-invariant half of a concatenated input can be hoisted out of the
    reasoning recurrence (read unit: concat(inter, kbProj) @ W ==
    inter @ W[:d] + kbProj @ W[d:], and the kbProj term repeats every step
    at eval)."""
    in_dim: int
    features: int
    cfg: Config
    act: str = "NON"

    def setup(self):
        self.weight = self.param("weight", nn.initializers.glorot_uniform(),
                                 (self.in_dim, self.features), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        self.act_mod = Act(self.act, self.cfg, name="act")
        if self.act != "NON":
            self.linear_2 = Linear(self.features, self.cfg, act="NON",
                                   act_layer=False, name="linear_2")

    def _finish(self, pre, train):
        y = self.act_mod(pre)
        if self.act != "NON":
            y = self.linear_2(y, train)
        return y

    def __call__(self, x, train: bool = False):
        w = self.weight.astype(x.dtype)
        pre = jnp.dot(x, w, preferred_element_type=jnp.float32
                      ).astype(x.dtype) + self.bias.astype(x.dtype)
        return self._finish(pre, train)

    def project_half(self, x, start: int, with_bias: bool):
        """x @ weight[start:start+x_dim] (+ bias): one half of the split
        first matmul."""
        w = self.weight[start:start + x.shape[-1]].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        if with_bias:
            y = y + self.bias.astype(x.dtype)
        return y

    def apply_split(self, x_first, hoisted, train: bool = False):
        """Combine the live first-half input with the precomputed
        (bias-inclusive) second half, then activation + act-layer."""
        pre = self.project_half(x_first, 0, with_bias=False) + hoisted
        return self._finish(pre, train)


class ReadUnit(nn.Module):
    """Extract relevant KB information given memory and control
    (reference: mac_cell.py:209-277).

    The KB/memory projections are setup-defined submodules so the hoisted
    (``project_kb``) and per-step paths share identical parameters.
    """
    cfg: Config

    def setup(self):
        cfg = self.cfg
        if cfg.readProjInputs:
            if cfg.readProjShared:
                proj = Linear(cfg.attDim, cfg, name="proj")
                self._proj_kb = proj
                self._proj_mem = proj
            else:
                self._proj_kb = Linear(cfg.attDim, cfg, name="projX")
                self._proj_mem = Linear(cfg.attDim, cfg, name="projY")
        dim = cfg.attDim if cfg.readProjInputs else cfg.memDim
        # interaction weights for parametrized modes
        if cfg.readMemAttType == "DIAG":
            self.mem_w = self.param("memInterW", _vector_glorot, (dim,),
                                    jnp.float32)
            self.mem_b = self.param("memInterB", nn.initializers.zeros,
                                    (dim,), jnp.float32)
        elif cfg.readMemAttType == "BL":
            self.mem_w = self.param("memInterW",
                                    nn.initializers.glorot_uniform(),
                                    (dim, dim), jnp.float32)
            self.mem_b = self.param("memInterB", nn.initializers.zeros,
                                    (dim,), jnp.float32)
        if cfg.readMemProj:
            in_dim = dim
            if cfg.readMemConcatKB:
                in_dim += cfg.attDim if cfg.readMemConcatProj else cfg.memDim
            self.mem_kb_proj = SplitActLinear(in_dim, dim, cfg,
                                              act=cfg.readMemAct,
                                              name="memKbProj")
        # dim of interactions entering the control stage
        inter_dim = dim
        if cfg.readMemConcatKB and not cfg.readMemProj:
            inter_dim += cfg.attDim if cfg.readMemConcatProj else cfg.memDim
        if cfg.readCtrl:
            if cfg.ctrlDim != inter_dim:
                self.ctrl_proj = Linear(inter_dim, cfg, name="ctrlProj")
            if cfg.readCtrlAttType == "DIAG":
                self.ctrl_w = self.param("ctrlInterW", _vector_glorot,
                                         (inter_dim,), jnp.float32)
                self.ctrl_b = self.param("ctrlInterB", nn.initializers.zeros,
                                         (inter_dim,), jnp.float32)
            elif cfg.readCtrlAttType == "BL":
                self.ctrl_w = self.param("ctrlInterW",
                                         nn.initializers.glorot_uniform(),
                                         (inter_dim, inter_dim), jnp.float32)
                self.ctrl_b = self.param("ctrlInterB", nn.initializers.zeros,
                                         (inter_dim,), jnp.float32)
        if cfg.readCtrl:
            self.ctrl_act = Act(cfg.readCtrlAct, cfg, name="ctrlAct")
        self.logits = Inter2Logits(cfg, dropout=cfg.readDropout,
                                   name="inter2logits")

    def project_kb(self, knowledge_base, train: bool = False):
        """Project the KB into the attention space once, outside the
        netLength recurrence (valid whenever KB dropout is inactive)."""
        return self._proj_kb(knowledge_base, train)

    def project_kb_w1(self, added, train: bool = False):
        """Hoist the step-invariant (concatenated-KB) half of the read
        projection's first matmul, bias included — computed once outside
        the recurrence instead of every step."""
        cfg = self.cfg
        d_inter = cfg.attDim if cfg.readProjInputs else cfg.memDim
        return self.mem_kb_proj.project_half(added, d_inter, with_bias=True)

    def _interact(self, x, y, mode, w=None, b=None):
        """One interaction between [B, S, D] and [B, D] (broadcast), in one
        of the reference's four modes (ops.py:700-713)."""
        cfg = self.cfg
        yb = y[:, None, :]
        if mode == "MUL":
            mb = jnp.asarray(cfg.mulBias, x.dtype)
            return (x + mb) * (yb + mb)
        if mode == "DIAG":
            return x * w.astype(x.dtype) * yb + b.astype(x.dtype)
        if mode == "BL":
            return jnp.dot(x, w.astype(x.dtype),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype) * yb + b.astype(x.dtype)
        return jnp.tanh(x + yb)  # ADD

    def __call__(self, knowledge_base, memory, control,
                 kb_proj: Optional[jnp.ndarray] = None,
                 kb_w1: Optional[jnp.ndarray] = None,
                 mem_dp_mask: Optional[jnp.ndarray] = None,
                 kb_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False):
        cfg = self.cfg

        # memory dropout (reference: mac_cell.py:213-217)
        if cfg.memoryVariationalDropout and mem_dp_mask is not None and train:
            memory = apply_var_dp_mask(memory, mem_dp_mask, cfg.memoryDropout)
        elif cfg.memoryDropout < 1.0 and train:
            memory = _dropout(self, memory, cfg.memoryDropout)

        # Step 1: KB (x) memory interactions (reference: mac_cell.py:219-240)
        projected_kb = None
        x = knowledge_base
        y = memory
        if cfg.readProjInputs:
            if cfg.readDropout < 1.0 and train:
                y = _dropout(self, y, cfg.readDropout)
            y = self._proj_mem(y, train)
            if kb_proj is not None:
                projected_kb = kb_proj
            else:
                xx = knowledge_base
                if cfg.readDropout < 1.0 and train:
                    xx = _dropout(self, xx, cfg.readDropout)
                projected_kb = self._proj_kb(xx, train)
            x = projected_kb

        interactions = self._interact(
            x, y, cfg.readMemAttType,
            getattr(self, "mem_w", None), getattr(self, "mem_b", None))
        if cfg.readMemProj and cfg.readMemConcatKB and kb_w1 is not None:
            # hoisted path: the concat-half matmul was precomputed outside
            # the recurrence; combine with the live interaction half
            interactions = self.mem_kb_proj.apply_split(interactions, kb_w1,
                                                        train)
        else:
            if cfg.readMemConcatKB:
                added = (projected_kb if cfg.readMemConcatProj
                         else knowledge_base)
                interactions = jnp.concatenate([interactions, added], axis=-1)
            # project memory interactions back (reference:
            # mac_cell.py:236-240)
            if cfg.readMemProj:
                interactions = self.mem_kb_proj(interactions, train)

        # Step 2: interactions with control (reference: mac_cell.py:242-262)
        if cfg.readCtrl:
            if cfg.ctrlDim != interactions.shape[-1]:
                control = self.ctrl_proj(control, train)
            ctrl_inter = self._interact(
                interactions, control, cfg.readCtrlAttType,
                getattr(self, "ctrl_w", None), getattr(self, "ctrl_b", None))
            if cfg.readCtrlConcatInter:
                ctrl_inter = jnp.concatenate([ctrl_inter, interactions],
                                             axis=-1)
            interactions = ctrl_inter
            if cfg.readCtrlConcatKB:
                added = projected_kb if cfg.readCtrlConcatProj else knowledge_base
                interactions = jnp.concatenate([interactions, added], axis=-1)
            interactions = self.ctrl_act(interactions)

        # Step 3: attention over the KB (reference: mac_cell.py:264-277).
        # kb_lengths (GQA object features): mask padded detector slots so
        # attention — and therefore the retrieved info — ignores them.
        # Clamped to >= 1: an image with zero detected objects attends to
        # slot 0 (a zero feature row -> info == 0), identically in the XLA
        # and fused engines (an all-masked row would otherwise diverge:
        # jax.nn.softmax's max-subtraction cancels a uniform -1e30 while
        # the fused kernels' max-free softmax underflows to zeros)
        logits = self.logits(interactions, train)
        attention = masked_softmax(
            logits,
            None if kb_lengths is None else jnp.maximum(kb_lengths, 1))

        source = projected_kb if cfg.readSmryKBProj else knowledge_base
        information = att2smry(attention, source)
        return information, attention


def _dropout(mod: nn.Module, x, keep: float):
    """Keep-prob dropout drawing from the module's 'dropout' RNG stream."""
    rng = mod.make_rng("dropout")
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class WriteUnit(nn.Module):
    """Integrate retrieved info into the memory state
    (reference: mac_cell.py:305-375)."""
    cfg: Config

    @nn.compact
    def __call__(self, memory, info, control, cont_control=None,
                 prev_controls: Optional[jnp.ndarray] = None,
                 prev_memories: Optional[jnp.ndarray] = None,
                 train: bool = False):
        cfg = self.cfg
        attentions = {}

        if cfg.writeInfoProj:
            info = Linear(cfg.memDim, cfg, name="info")(info, train)
        info = Act(cfg.writeInfoAct, cfg, name="infoAct")(info)

        # self-attention over previous controls -> previous memories
        # (reference: mac_cell.py:316-330)
        self_smry = None
        if cfg.writeSelfAtt:
            self_control = cont_control if cfg.writeSelfAttMod == "CONT" else control
            self_control = Linear(cfg.ctrlDim, cfg,
                                  name="ctrlProj")(self_control, train)
            interactions = prev_controls * self_control[:, None, :]
            logits = Inter2Logits(cfg, name="selfAttention")(interactions, train)
            attention = masked_softmax(logits)
            attentions["self"] = attention
            self_smry = att2smry(attention, prev_memories)

        # combine memory and info (reference: mac_cell.py:333-339)
        new_memory = memory
        if cfg.writeInputs == "INFO":
            new_memory = info
        elif cfg.writeInputs == "SUM":
            new_memory = memory + info
        elif cfg.writeInputs == "BOTH":
            if cfg.writeConcatMul:
                new_memory = jnp.concatenate(
                    [memory, info, memory * info], axis=-1)
            else:
                new_memory = jnp.concatenate([memory, info], axis=-1)
        # else MEM: previous memory only

        if cfg.writeSelfAtt:
            new_memory = jnp.concatenate([new_memory, self_smry], axis=-1)
        if cfg.writeMergeCtrl:
            new_memory = jnp.concatenate([new_memory, control], axis=-1)

        # project to memDim (reference: mac_cell.py:351-352)
        if cfg.writeMemProj or new_memory.shape[-1] != cfg.memDim:
            new_memory = Linear(cfg.memDim, cfg,
                                name="newMemory")(new_memory, train)
        new_memory = Act(cfg.writeMemAct, cfg, name="memAct")(new_memory)

        # memory gate conditioned on control (reference: mac_cell.py:358-367)
        if cfg.writeGate:
            gate_dim = 1 if cfg.writeGateShared else cfg.memDim
            z = jax.nn.sigmoid(
                Linear(gate_dim, cfg, bias=cfg.writeGateBias,
                       name="gate")(control, train))
            if cfg.writeGateShared:
                z = z[:, None] if z.ndim == 1 else z
            attentions["gate"] = z
            new_memory = new_memory * z + memory * (1.0 - z)

        # optional batch norm on memory (reference: mac_cell.py:370-373)
        if cfg.memoryBN:
            new_memory = nn.BatchNorm(
                use_running_average=not train, momentum=cfg.bnDecay,
                use_bias=cfg.bnCenter, use_scale=cfg.bnScale,
                dtype=new_memory.dtype, name="memBN")(new_memory)

        return new_memory, attentions


class MemAutoEnc(nn.Module):
    """Memory->control auto-encoder loss (reference: mac_cell.py:377-405;
    flags commented out in reference config.py:401-406 — the one §2
    inventory row with no round-1 counterpart).  Reconstructs the step's
    control (or its word attention) from the new memory / retrieved info;
    the weighted sum over steps is added to the training loss."""
    cfg: Config

    @nn.compact
    def __call__(self, new_memory, info, control, cntx_words, lengths,
                 q_att, train: bool = False):
        cfg = self.cfg
        features = info if cfg.autoEncMemInputs == "INFO" else new_memory
        features = Linear(cfg.ctrlDim, cfg, act=cfg.autoEncMemAct,
                          name="aeMem")(features, train)

        if cfg.autoEncMemLoss == "CONT":
            return jnp.mean(jnp.square(control - features))

        interactions, _ = Mul(cfg, concat_x=cfg.autoEncMemCnct,
                              mul_bias=cfg.mulBias,
                              name="aeMemMul")(cntx_words, features, train)
        logits = Inter2Logits(cfg, name="inter2logits")(interactions, train)
        logits = exp_mask(logits.astype(jnp.float32), lengths)

        if cfg.autoEncMemLoss == "PROB":
            # softmax CE against the step's own question attention
            log_p = jax.nn.log_softmax(logits, axis=-1)
            target = q_att.astype(jnp.float32)
            return jnp.mean(-jnp.sum(target * log_p, axis=-1))

        # "SMRY": reconstruct control through the word attention
        attention = jax.nn.softmax(logits, axis=-1).astype(cntx_words.dtype)
        summary = att2smry(attention, cntx_words)
        return jnp.mean(jnp.square(control - summary))


class MACCell(nn.Module):
    """One full MAC step: control -> read -> write
    (reference: mac_cell.py:420-480).  Parameters are shared across steps by
    calling the same module instance per step (the reference shares via
    reuse=(iteration>0), mac_cell.py:429-438); ``unsharedCells`` instead
    instantiates one cell per step in the recurrence driver."""
    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.control_unit = ControlUnit(cfg, name="control")
        self.read = ReadUnit(cfg, name="read")
        self.write = WriteUnit(cfg, name="write")
        if cfg.autoEncMem:
            self.mem_auto_enc = MemAutoEnc(cfg, name="memAutoEnc")

    def project_kb(self, knowledge_base, train: bool = False):
        return self.read.project_kb(knowledge_base, train)

    def project_kb_w1(self, added, train: bool = False):
        return self.read.project_kb_w1(added, train)

    def __call__(self, state, control_input, in_words, out_words, lengths,
                 knowledge_base, kb_proj=None, kb_w1=None, mem_dp_mask=None,
                 kb_lengths=None, prev_controls=None, prev_memories=None,
                 vec_questions=None, train: bool = False):
        cfg = self.cfg
        control, memory, cont_control = state

        new_control, new_cont_control, q_att = self.control_unit(
            control_input, in_words, out_words, lengths, control,
            cont_control, train)

        # ablation: whole question as control (reference: mac_cell.py:455-457)
        if cfg.controlWholeQ:
            new_control = vec_questions

        info, kb_att = self.read(
            knowledge_base, memory, new_control, kb_proj=kb_proj,
            kb_w1=kb_w1, mem_dp_mask=mem_dp_mask, kb_lengths=kb_lengths,
            train=train)

        if cfg.writeDropout < 1.0 and train:
            info = _dropout(self, info, cfg.writeDropout)

        new_memory, w_atts = self.write(
            memory, info, new_control, new_cont_control,
            prev_controls=prev_controls, prev_memories=prev_memories,
            train=train)

        atts = {"question": q_att, "kb": kb_att}
        atts.update(w_atts)
        # auto-encoder loss (reference call site commented: mac_cell.py:468)
        if cfg.autoEncMem:
            atts["autoEncMem"] = self.mem_auto_enc(
                new_memory, info, new_control, out_words, lengths, q_att,
                train)
        return (new_control, new_memory, new_cont_control), info, atts

    def scan_step(self, carry, control_input, in_words, out_words, lengths,
                  knowledge_base, kb_proj, kb_w1, mem_dp_mask, kb_lengths,
                  vec_questions, train):
        """(carry, x) -> (carry, ys) adapter for ``nn.scan`` over the
        reasoning steps (useScan path; requires shared cells and no
        write self-attention — the growing history forces unrolling,
        SURVEY.md §7 hard parts)."""
        state, info, atts = self(
            carry, control_input, in_words, out_words, lengths,
            knowledge_base, kb_proj=kb_proj, kb_w1=kb_w1,
            mem_dp_mask=mem_dp_mask, kb_lengths=kb_lengths,
            prev_controls=None, prev_memories=None,
            vec_questions=vec_questions, train=train)
        return state, atts
