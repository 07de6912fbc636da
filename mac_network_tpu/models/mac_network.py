"""The MAC network: input units, recurrence driver, output unit
(reference: model.py).

Structure (reference: model.py:762-829):
  embeddings -> question encoder (bi-LSTM) -> conv stem -> netLength MAC
  steps -> output unit -> classifier.

TPU-first decisions:
  * The netLength recurrence is an unrolled jit loop (netLength is static;
    XLA shares the compiled cell body).  This directly supports per-step
    unshared parameters (controlInputUnshared / unsharedCells) and the
    growing self-attention history, with exact reference semantics.
  * The per-step question projections (qInput + per-step qInput_i,
    reference: mac_cell.py:427-448) are precomputed for all steps before
    the loop — they only depend on the question vector.
  * At eval the read unit's KB projection is hoisted out of the loop
    (same params — see mac_cell.ReadUnit.project_kb).
  * Activations run in cfg.computeDtype (bf16 on TPU for inference);
    parameters, softmaxes and the final logits stay f32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.models.baselines import Baseline
from mac_network_tpu.models.mac_cell import MACCell
from mac_network_tpu.ops.activations import Act
from mac_network_tpu.ops.cnn import CNNLayer
from mac_network_tpu.ops.dropout import (apply_var_dp_mask,
                                         generate_var_dp_mask)
from mac_network_tpu.ops.linear import Linear, FCLayer
from mac_network_tpu.ops.location import AddLocation, LinearizeFeatures
from mac_network_tpu.ops.mul import Mul
from mac_network_tpu.ops.rnn import RNNLayer, GridRNN


def _normal_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class QuestionEncoder(nn.Module):
    """Question input unit (reference: model.py:242-307): embedding lookup
    with the <PAD> row pinned to zeros (model.py:215-218), stacked RNN
    layers, dropouts, optional output projections."""
    cfg: Config
    embedding_init: Any            # dict from Preprocesser.initializeQAEmbeddings

    @nn.compact
    def __call__(self, question_ids, lengths, train: bool = False):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.computeDtype == "bfloat16" else jnp.float32

        emb_init = self.embedding_init
        key = "qa" if cfg.ansEmbMod == "SHARED" else "q"
        init_matrix = np.asarray(emb_init[key], np.float32)
        emb = self.param("emb", lambda k: jnp.asarray(init_matrix))
        if cfg.wrdEmbFixed:
            emb = jax.lax.stop_gradient(emb)
        # row 0 (<PAD>) fixed to zeros (reference: model.py:217)
        table = jnp.concatenate(
            [jnp.zeros((1, cfg.wrdEmbDim), emb.dtype), emb], axis=0)
        words = jnp.take(table, question_ids, axis=0).astype(dtype)

        # answer embeddings (reference: model.py:223-236)
        a_emb = None
        if cfg.ansEmbMod == "SHARED":
            ans_map = jnp.asarray(np.asarray(emb_init["ansMap"], np.int32))
            a_emb = jnp.take(table, ans_map, axis=0).astype(dtype)
        elif cfg.ansEmbMod == "BOTH":
            a_init = np.asarray(emb_init["a"], np.float32)
            a_emb = self.param("aEmb", lambda k: jnp.asarray(a_init)).astype(dtype)

        # encoder RNN stack — parity: the reference feeds the *embeddings*
        # to every layer i (model.py:291-294), so only the last layer's
        # output is used; replicated exactly.
        var_dp = cfg.encVariationalDropout
        for i in range(cfg.encNumLayers):
            cntx, vec = RNNLayer(
                cfg.encDim, cfg, bi=cfg.encBi, cell_type=cfg.encType,
                dropout=cfg.encInputDropout, var_dp=var_dp,
                var_input_keep=cfg.encInputDropout,
                var_state_keep=cfg.encStateDropout,
                name=f"rnn{i}")(words, lengths, train)

        if cfg.qDropout < 1.0:
            vec = nn.Dropout(rate=1.0 - cfg.qDropout,
                             deterministic=not train)(vec)

        # projections (reference: model.py:299-306; condition model.py:786)
        proj = (cfg.encDim != cfg.ctrlDim) or cfg.encProj
        if proj:
            cntx = Linear(cfg.ctrlDim, cfg, name="projCW")(cntx, train)
            vec = Linear(cfg.ctrlDim, cfg, act=cfg.encProjQAct,
                         name="projQ")(vec, train)

        return words, cntx, vec, a_emb


class Stem(nn.Module):
    """Image input unit (reference: model.py:165-204): 2-layer CNN over the
    feature grid, flattened to the [B, H*W, memDim] knowledge base."""
    cfg: Config

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        out_dim = cfg.memDim
        if cfg.stemLinear:
            features = Linear(out_dim, cfg, name="linearStem")(images, train)
        else:
            dims = [cfg.stemDim] * (cfg.stemNumLayers - 1) + [out_dim]
            if cfg.locationAware:
                images = AddLocation(
                    cfg, l_dim=cfg.locationDim, loc_type=cfg.locationType,
                    name="loc")(images, train)
            features = CNNLayer(
                dims, cfg, batch_norm=cfg.stemBN, dropout=cfg.stemDropout,
                kernel_sizes=cfg.stemKernelSizes,
                strides=cfg.stemStrideSizes, name="cnn")(images, train)
            if cfg.stemGridRnn:
                features = GridRNN(out_dim, cfg, name="gridRnn")(features, train)
        B = features.shape[0]
        return features.reshape(B, -1, out_dim)


class OutputUnit(nn.Module):
    """Output unit step 1: assemble the classifier inputs — final memory,
    optionally (x) question, optionally (+) flattened image
    (reference: model.py:512-528)."""
    cfg: Config

    @nn.compact
    def __call__(self, memory, vec_questions, images, train: bool = False):
        cfg = self.cfg
        features = memory

        if cfg.outQuestion:
            e_q = Linear(cfg.memDim, cfg, name="outQuestion")(
                vec_questions, train)
            if cfg.outQuestionMul:
                features = jnp.concatenate(
                    [features, e_q, features * e_q], axis=-1)
            else:
                features = jnp.concatenate([features, e_q], axis=-1)

        if cfg.outImage:
            img = LinearizeFeatures(cfg, out_dim=cfg.outImageDim,
                                    name="linImage")(images, train)
            img = Linear(cfg.outImageDim, cfg, name="outImage")(img, train)
            features = jnp.concatenate([features, img], axis=-1)

        return features


class Classifier(nn.Module):
    """Output unit step 2: FC network to answer logits, with optional
    answer-embedding dot-product modes (reference: model.py:547-576)."""
    cfg: Config

    @nn.compact
    def __call__(self, features, a_emb=None, train: bool = False):
        cfg = self.cfg
        out_dim = cfg.answerWordsNum
        dims = list(cfg.outClassifierDims) + [out_dim]
        if cfg.answerMod != "NON":
            dims[-1] = cfg.wrdEmbDim
        logits = FCLayer(dims, cfg,
                         batch_norm=cfg.outputBN,
                         dropout=cfg.outputDropout, name="fc")(features, train)

        if cfg.answerMod != "NON":
            if cfg.outputDropout < 1.0:
                logits = nn.Dropout(rate=1.0 - cfg.outputDropout,
                                    deterministic=not train)(logits)
            inter, _ = Mul(cfg, inter_mod=cfg.answerMod,
                           name="ansInter")(a_emb, logits, train)
            logits = jnp.sum(inter, axis=-1)
            bias = self.param("ansBias", nn.initializers.zeros,
                              (out_dim,), jnp.float32)
            logits = logits + bias.astype(logits.dtype)

        return logits.astype(jnp.float32)


class MACRecurrence(nn.Module):
    """Recurrence driver: state init + netLength unrolled MAC steps
    (reference: model.py:428-489 and MACCell.zero_state,
    mac_cell.py:496-592)."""
    cfg: Config

    def setup(self):
        cfg = self.cfg
        self._use_scan = (cfg.useScan and not cfg.unsharedCells
                          and not cfg.writeSelfAtt)
        if cfg.useScan and not self._use_scan:
            # warn (once per process) rather than silently unrolling
            import warnings
            why = ("unsharedCells (per-step parameters)" if cfg.unsharedCells
                   else "writeSelfAtt (growing step history)")
            warnings.warn(
                f"--useScan disabled: {why} requires the unrolled "
                f"recurrence; running unrolled.", stacklevel=2)
        if cfg.unsharedCells:
            self.cells = [MACCell(cfg, name=f"cell{i}")
                          for i in range(cfg.netLength)]
        elif self._use_scan:
            scanned = nn.scan(
                MACCell,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=(0,) + (nn.broadcast,) * 10,
                out_axes=0,
                methods=["scan_step"])
            # same attribute name -> same "cell" parameter subtree as the
            # unrolled path, so useScan toggles without checkpoint breakage
            self.cell = scanned(cfg, name="cell")
        else:
            self.cell = MACCell(cfg, name="cell")
        # per-step question input projections (reference: mac_cell.py:427-448)
        self.q_input = Linear(cfg.ctrlDim, cfg, name="qInput")
        if cfg.controlInputUnshared:
            self.q_inputs_u = [Linear(cfg.ctrlDim, cfg, name=f"qInput{i}")
                               for i in range(cfg.netLength)]
        else:
            self.q_input_u = Linear(cfg.ctrlDim, cfg, name="qInputU")
        if cfg.initCtrl == "PRM":
            self.init_ctrl = self.param("initCtrl", _normal_init,
                                        (cfg.ctrlDim,))
        if cfg.initMem == "PRM":
            self.init_mem = self.param("initMem", _normal_init, (cfg.memDim,))
        if cfg.initKBwithQ != "NON":
            self.kb_q_proj = Linear(cfg.memDim, cfg, name="questions")
            self.kb_init = Linear(cfg.memDim, cfg, name="initKB")
        if cfg.addNullWord:
            self.null_word = self.param("zeroWord", _normal_init,
                                        (1, cfg.ctrlDim))
        if cfg.controlInWordsProj or cfg.controlOutWordsProj:
            self.words_proj = Linear(cfg.ctrlDim, cfg, name="wordsProj")
        self.input_act = Act(cfg.controlInputAct, cfg, name="inputAct")

    def _init_state(self, init_type, prm, dim, batch, vec_questions, dtype):
        """(reference: mac_cell.py:496-505)"""
        if init_type == "PRM":
            return jnp.broadcast_to(prm.astype(dtype)[None], (batch, dim))
        if init_type == "ZERO":
            return jnp.zeros((batch, dim), dtype)
        return vec_questions  # "Q"

    def __call__(self, knowledge_base, vec_questions, question_words,
                 question_cntx_words, lengths, train: bool = False,
                 kb_lengths=None):
        cfg = self.cfg
        B = vec_questions.shape[0]
        dtype = vec_questions.dtype
        T = cfg.netLength

        # ---- state init (reference: mac_cell.py:539-592)
        control = self._init_state(cfg.initCtrl,
                                   getattr(self, "init_ctrl", None),
                                   cfg.ctrlDim, B, vec_questions, dtype)
        memory = self._init_state(cfg.initMem,
                                  getattr(self, "init_mem", None),
                                  cfg.memDim, B, vec_questions, dtype)
        cont_control = control

        # optionally merge question into the KB (reference: mac_cell.py:560-565)
        if cfg.initKBwithQ != "NON":
            i_q = self.kb_q_proj(vec_questions, train)
            i_q_b = jnp.broadcast_to(i_q[:, None, :], knowledge_base.shape)
            if cfg.initKBwithQ == "MUL":
                cnct = jnp.concatenate(
                    [knowledge_base, i_q_b, knowledge_base * i_q_b], axis=-1)
            else:  # CNCT
                cnct = jnp.concatenate([knowledge_base, i_q_b], axis=-1)
            knowledge_base = self.kb_init(cnct, train)

        # word source selection (reference: mac_cell.py:570)
        words = question_cntx_words if cfg.controlContextual else question_words
        if cfg.addNullWord:
            null = jnp.broadcast_to(self.null_word.astype(dtype)[None],
                                    (B, 1, cfg.ctrlDim))
            words = jnp.concatenate([null, words], axis=1)
            lengths = lengths + 1
        in_words = out_words = words
        if cfg.controlInWordsProj or cfg.controlOutWordsProj:
            p_words = self.words_proj(words, train)
            in_words = p_words if cfg.controlInWordsProj else words
            out_words = p_words if cfg.controlOutWordsProj else words

        # memory variational dropout mask (reference: mac_cell.py:589-590)
        mem_dp_mask = None
        if cfg.memoryVariationalDropout and train:
            mem_dp_mask = generate_var_dp_mask(
                self.make_rng("dropout"), (B, cfg.memDim), cfg.memoryDropout)

        # precompute per-step control inputs (reference: mac_cell.py:442-448)
        shared = self.q_input(vec_questions, train)
        shared = self.input_act(shared)
        control_inputs = []
        for i in range(T):
            proj = (self.q_inputs_u[i] if cfg.controlInputUnshared
                    else self.q_input_u)
            control_inputs.append(proj(shared, train))

        # KB projection hoisting: valid whenever per-step KB dropout is
        # inactive (always at eval; see mac_cell.ReadUnit docstring) or
        # tied across steps (--readVariationalDropout: one mask for the
        # whole recurrence, so the dropped-KB projections are
        # step-invariant even during training).
        # With unshared cells each step has its own projection — no hoist.
        kb_proj = None
        kb_w1 = None
        hoist = (cfg.readProjInputs and not cfg.unsharedCells
                 and (not train or cfg.readDropout >= 1.0
                      or cfg.readVariationalDropout))
        if hoist:
            kb_in = knowledge_base
            if train and cfg.readVariationalDropout and cfg.readDropout < 1.0:
                kb_mask = generate_var_dp_mask(
                    self.make_rng("dropout"), knowledge_base.shape,
                    cfg.readDropout)
                kb_in = apply_var_dp_mask(knowledge_base, kb_mask,
                                          cfg.readDropout)
            kb_proj = self.cell.project_kb(kb_in, train)
            if cfg.readMemProj and cfg.readMemConcatKB:
                # also hoist the concat-half of the read projection's first
                # matmul (step-invariant at eval) — ~1/3 of the read FLOPs
                added = kb_proj if cfg.readMemConcatProj else knowledge_base
                kb_w1 = self.cell.project_kb_w1(added, train)

        state = (control, memory, cont_control)

        # ---- scanned recurrence: one compiled step body instead of T
        # copies (useScan; needs shared cells and no self-attention history)
        if self._use_scan:
            stacked_ci = jnp.stack(control_inputs, axis=0)      # [T, B, d]
            state, atts = self.cell.scan_step(
                state, stacked_ci, in_words, out_words, lengths,
                knowledge_base, kb_proj, kb_w1, mem_dp_mask, kb_lengths,
                vec_questions, train)
            return state[0], state[1], atts

        # ---- unrolled recurrence (reference: model.py:447-458)
        controls = [control]
        memories = [memory]
        infos = []
        att_hist: Dict[str, list] = {"question": [], "kb": [], "self": [],
                                     "gate": [], "autoEncMem": []}
        for i in range(T):
            cell = (self.cells[i] if cfg.unsharedCells else self.cell)
            prev_controls = jnp.stack(controls, axis=1) \
                if cfg.writeSelfAtt else None
            prev_memories = jnp.stack(memories, axis=1) \
                if cfg.writeSelfAtt else None
            state, info, atts = cell(
                state, control_inputs[i], in_words, out_words, lengths,
                knowledge_base, kb_proj=kb_proj, kb_w1=kb_w1,
                mem_dp_mask=mem_dp_mask, kb_lengths=kb_lengths,
                prev_controls=prev_controls, prev_memories=prev_memories,
                vec_questions=vec_questions, train=train)
            controls.append(state[0])
            memories.append(state[1])
            infos.append(info)
            for k in att_hist:
                if k in atts:
                    att_hist[k].append(atts[k])

        # the self-attention maps grow with the step ([B, t+1]); pad to the
        # full history length so they stack into one [T, B, T+1] tensor
        if att_hist["self"]:
            padded = []
            for a in att_hist["self"]:
                pad = (T + 1) - a.shape[-1]
                padded.append(jnp.pad(a, ((0, 0), (0, pad))))
            att_hist["self"] = padded
        attentions = {k: jnp.stack(v, axis=0) for k, v in att_hist.items() if v}
        return state[0], state[1], attentions


class MACNetwork(nn.Module):
    """Full model graph (reference: model.py:762-829 build)."""
    cfg: Config
    embedding_init: Any

    @nn.compact
    def __call__(self, question_ids, lengths, images, train: bool = False,
                 kb_lengths=None):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.computeDtype == "bfloat16" else jnp.float32
        images = images.astype(dtype)

        words, cntx, vec_q, a_emb = QuestionEncoder(
            cfg, self.embedding_init, name="qEmbeddings")(
                question_ids, lengths, train)

        if cfg.useBaseline:
            # baseline models skip the output-unit assembly and feed the
            # classifier directly (reference: model.py:794-809)
            features = Baseline(cfg, name="baseline")(vec_q, images, train)
            attentions = {}
        else:
            kb = Stem(cfg, name="stem")(images, train)
            final_control, final_memory, attentions = MACRecurrence(
                cfg, name="mac")(kb, vec_q, words, cntx, lengths, train,
                                 kb_lengths=kb_lengths)
            features = OutputUnit(cfg, name="output")(
                final_memory, vec_q, images, train)

        logits = Classifier(cfg, name="classifier")(features, a_emb, train)
        return logits, attentions
