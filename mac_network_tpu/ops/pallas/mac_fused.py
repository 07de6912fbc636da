"""Fused Pallas kernel for the netLength MAC recurrence (inference).

The device hot loop (SURVEY.md §3.3) is netLength repetitions of
control-attention over <=L question words, read-attention over the S=H*W
knowledge-base cells, and the write update.  The XLA path streams the
[B, S, d] interaction tensors through HBM every step; this kernel instead
keeps the KB tiles and all cell weights resident in VMEM across ALL
netLength steps — the KB is read from HBM once per example instead of once
per step per tensor.

Design (v2 — closes most of the gap to XLA's fused recurrence; measured
analysis in ARCHITECTURE.md "Performance snapshot"):

  * **The control unit is loop-independent** whenever ``controlFeedPrev``
    is off (the shipped args/args2/args3/args4 variants): each step's
    control is attention of a precomputed per-step projection ``ci_t``
    over the question words, with no dependence on memory or the previous
    control (reference: mac_cell.py:133-187 — the recurrent merge is only
    entered under controlFeedPrev, :142-151).  So the engine computes ALL
    netLength controls as one batched XLA einsum, and the kernel loop is
    just the memory chain (read + write).  The same applies to the write
    gate (a function of the step's control, mac_cell.py:358-367) and to
    the write self-attention *weights* (a function of the control history,
    mac_cell.py:316-330) — both precomputed; only the attention-weighted
    sum over previous *memories* stays in the loop.
  * **The KB axis is padded to the sublane tile** (16 for bf16, 8 for
    f32), so the per-step [Bt, S, d] -> [Bt*S, d] reshapes around the MXU
    matmuls are layout-trivial instead of physical relayouts; padded cells
    are masked out of the read softmax with an additive -inf row.
  * The step-invariant half of the read unit's first projection
    (concat(inter, kbProj) @ W1 == inter @ W1a + kbProj @ W1b, constant at
    eval) is computed OUTSIDE the kernel as one big batched matmul
    (reference re-does this 1/3 of the read FLOPs every step).
  * The write unit's two matmuls run as one concat matmul (one MXU weight
    load per step instead of two; M = Bt is tiny so weight loads dominate
    these small matmuls).
  * Every matmul runs on the MXU in bf16 with f32 accumulation; the read
    softmax runs in f32.

Supported config envelope (``supports_fused_config``): all five shipped
variants —
  * args / args2 (non-recurrent control), args4 (+ write gate): fully
    hoisted control/gate, kernel loop = read + write;
  * args3 (writeSelfAtt): self-attention weights over the control history
    precomputed; the kernel keeps a [T+1, Bt, d] memory-history scratch
    and mixes it with the precomputed weights (mac_cell.py:316-330);
  * args1 (controlFeedPrev + FeedPrevAtt + FeedInputs + TANH): the control
    recurrence is genuinely sequential, so a second kernel body keeps the
    control unit in-loop (words resident in VMEM); the ci half of the
    contControl projection is still precomputed per step.
Everything else falls back to the XLA path (mac_network.MACRecurrence).

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
# batches above this run as unrolled chunks (one pallas_call per chunk)
_MAX_CALL_BATCH = 512


def supports_fused_config(cfg: Config) -> bool:
    """The flag combinations the fused kernels implement exactly.

    Numerics caveat: the kernel's read softmax is max-free with logits
    clamped at 80 (see ``_read_write_step``) — exact whenever every KB
    logit is in (-87, 80], which holds for trained-model magnitudes
    (O(10)).  Untrained or adversarial weights whose logits leave that
    band can make the fused path deviate from the XLA path; callers in
    that regime should use ``MACNetwork.apply`` instead.
    """
    common = (
        cfg.readProjInputs and not cfg.readProjShared
        and cfg.readMemAttType == "MUL" and cfg.readMemConcatKB
        and cfg.readMemConcatProj and cfg.readMemProj
        and cfg.readMemAct == "RELU"
        and cfg.readCtrl and cfg.readCtrlAttType == "MUL"
        and not cfg.readCtrlConcatKB and not cfg.readCtrlConcatInter
        and cfg.readCtrlAct == "RELU" and not cfg.readSmryKBProj
        and cfg.ctrlDim == cfg.attDim
        and not cfg.controlConcatWords and not cfg.controlProj
        and not cfg.controlContinuous and not cfg.controlWholeQ
        and not cfg.controlInWordsProj and not cfg.controlOutWordsProj
        and cfg.writeInputs == "BOTH" and not cfg.writeConcatMul
        and not cfg.writeMergeCtrl
        and not cfg.writeInfoProj and cfg.writeInfoAct == "NON"
        and cfg.writeMemAct == "NON" and not cfg.memoryBN
        and not cfg.unsharedCells and cfg.initKBwithQ == "NON"
        and not cfg.addNullWord and cfg.relu in ("ELU", "STD")
        and cfg.mulBias == 0.0 and not cfg.autoEncMem
    )
    if not common:
        return False
    if cfg.controlFeedPrev:
        # args1: recurrent control stays in-kernel; the growing
        # self-attention history on top of it is not supported
        return (not cfg.writeSelfAtt
                and cfg.controlContAct in ("NON", "TANH", "RELU"))
    return True


def _act(x, kind: str):
    # Mosaic on this target has no bf16 compare and no expm1 lowering, so
    # ELU is written compare-free:  elu(x) = max(x,0) + exp(min(x,0)) - 1
    # (for x>0 the exp term is exp(0)-1 = 0; for x<=0 the max term is 0).
    # Stays in the input dtype — no f32 temporaries live across the matmuls.
    if kind == "ELU":
        one = jnp.asarray(1.0, x.dtype)
        zero = jnp.asarray(0.0, x.dtype)
        return jnp.maximum(x, zero) + jnp.exp(jnp.minimum(x, zero)) - one
    if kind == "TANH":
        return jnp.tanh(x)
    if kind == "NON":
        return x
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


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------------------------------------------------ kernels

def _read_write_step(relu_kind, S_real,
                     kb, kbp, kbw1b, memory, control,
                     wmem_ref, bmem_ref, w1a_ref, w2_ref, b2_ref,
                     wr128, br, w3_ref, b3_ref, smry=None, kmask=None):
    """One read + write step shared by both kernel bodies.

    kb/kbp: [Bt, Sp, d] VMEM-resident values; kbw1b: [Bt*Sp, d] hoisted
    half-projection (bias included); memory/control: [Bt, d];
    wr128: [d, 128] — the read-logits vector weight broadcast across a full
    MXU lane tile, so the rank-1 logits contraction runs on the MXU instead
    of as a (slow) cross-lane VPU reduction.
    kmask: optional [Bt, Sp] f32 per-example additive mask (0 valid /
    NEG_INF masked) — GQA's per-image valid-object counts (kb_lengths,
    reference branch semantics; the XLA path's masked_softmax).  When
    given it already folds the static Sp/S_real padding.
    Returns the pre-gate new memory.
    """
    Bt, Sp, d = kb.shape
    dtype = kb.dtype

    # ---- read unit (reference: mac_cell.py:209-277)
    y = (_dot(memory, wmem_ref[...]) + bmem_ref[...]).astype(dtype)
    inter2 = (kbp * y[:, None, :]).reshape(Bt * Sp, d)
    h = _dot_lowp(inter2, w1a_ref[...]) + kbw1b
    h = _act(h, relu_kind)
    h = _dot_lowp(h, w2_ref[...]) + b2_ref[...].astype(dtype)  # act-layer
    e = _act(h.reshape(Bt, Sp, d) * control[:, None, :], relu_kind)
    r = _dot(e.reshape(Bt * Sp, d), wr128)                 # f32 [Bt*Sp, 128]
    # The read softmax runs entirely in the SUBLANE layout the matmul
    # produced (S on sublanes): extracting a lane-layout [Bt, Sp] logits
    # row would be a physical transpose, and the attention weights would
    # need transposing back to multiply kb — measured ~1ms/recurrence.
    # Max-free softmax: exact whenever max|logit| <= 80 (the clamp keeps
    # exp finite beyond that; trained-model KB logits are O(10)); the
    # epsilon keeps an all-underflow row at zero instead of NaN.
    if kmask is None:
        pad_mask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1) < S_real,
            0.0, NEG_INF).astype(jnp.float32)
    else:
        pad_mask = kmask[:, :, None]               # [Bt, Sp, 1] f32
    rl = r.reshape(Bt, Sp, 128) + br + pad_mask
    ex = jnp.exp(jnp.minimum(rl, 80.0))
    sm = jnp.sum(ex, axis=1, keepdims=True)
    ratt3 = (ex / (sm + 1e-30)).astype(dtype)              # [Bt, Sp, 128]
    rb = jnp.broadcast_to(ratt3[:, :, :1], (Bt, Sp, d))
    info = jnp.sum(rb * kb, axis=1).astype(dtype)

    # ---- write unit: concat(mem, info[, smry]) @ W3 as ONE matmul
    # (reference: mac_cell.py:333-352); M = Bt is tiny, so one MXU weight
    # load instead of two/three dominates the cost of these matmuls
    parts = [memory, info] + ([smry] if smry is not None else [])
    new_mem = (_dot(jnp.concatenate(parts, axis=-1), w3_ref[...])
               + b3_ref[...]).astype(dtype)
    return new_mem


def _project_kb_in_kernel(kb, wpx_ref, bpx_ref, w1b_ref, b1_ref):
    """Compute the two hoisted KB projections ONCE per tile, in VMEM:
    kbp = kb @ Wpx + bpx (the read unit's projX) and the concat-half of the
    first read matmul kbw1b = kbp @ W1b + b1.  Doing this in-kernel (instead
    of in the XLA glue) removes two [B, S, d] tensors' HBM write+read
    round-trip — the kernel DMAs only kb and amortizes the projections over
    all T steps."""
    Bt, Sp, d = kb.shape
    dtype = kb.dtype
    kb2 = kb.reshape(Bt * Sp, d)
    kbp2 = (_dot(kb2, wpx_ref[...]) + bpx_ref[...]).astype(dtype)
    kbw1b = (_dot(kbp2, w1b_ref[...]) + b1_ref[...]).astype(dtype)
    return kbp2.reshape(Bt, Sp, d), kbw1b


def _build_hoisted_kernel(T: int, relu_kind: str, S_real: int,
                          use_gate: bool, use_satt: bool,
                          with_mem_hist: bool = False,
                          with_kb_mask: bool = False):
    """Kernel body for the non-recurrent-control variants (args, args2,
    args3, args4): controls / gates / self-attention weights arrive
    precomputed; the loop is the memory chain only.

    ``with_mem_hist`` adds a [T, Bt, d] output of every step's (post-gate)
    memory — the debug-outputs hook (SURVEY §7): the glue recomputes the
    per-step KB read attention from it, so the fast path stays unchanged
    when attention maps are not requested."""

    def kernel(*refs):
        it = iter(refs)
        kb_ref = next(it)
        kmask_ref = next(it) if with_kb_mask else None   # [Bt, Sp] f32
        ctrl_ref = next(it)                       # [T, Bt, d]
        gates_ref = next(it) if use_gate else None   # [T, Bt, d]
        satt_ref = next(it) if use_satt else None    # [T, T, Bt] f32
        mem0_ref = next(it)
        wpx_ref, bpx_ref, w1b_ref, b1_ref = (next(it) for _ in range(4))
        wmem_ref, bmem_ref, w1a_ref, w2_ref, b2_ref = (
            next(it) for _ in range(5))
        wr_ref, br_ref, w3_ref, b3_ref = (next(it) for _ in range(4))
        out_ref = next(it)
        memhist_ref = next(it) if with_mem_hist else None  # [T, Bt, d]
        hist_ref = next(it) if use_satt else None    # scratch [T+1, Bt, d]

        Bt, Sp, d = kb_ref.shape
        dtype = kb_ref.dtype
        kb = kb_ref[...]
        kmask = kmask_ref[...] if with_kb_mask else None
        kbp, kbw1b = _project_kb_in_kernel(kb, wpx_ref, bpx_ref,
                                           w1b_ref, b1_ref)
        wr128 = wr_ref[...]
        br = br_ref[0, 0]

        if use_satt:
            hist_ref[...] = jnp.zeros_like(hist_ref)
            hist_ref[0] = mem0_ref[...]

        def step(t, memory):
            control = ctrl_ref[t]
            smry = None
            if use_satt:
                # attention-weighted sum of previous memories with the
                # PRECOMPUTED weights (zeros beyond step t, so the
                # zero-initialised future slots contribute nothing)
                att = satt_ref[t]                        # [T, Bt] f32
                hist = hist_ref[0:T]                     # [T, Bt, d]
                smry = jnp.sum(att[:, :, None] * hist.astype(jnp.float32),
                               axis=0).astype(dtype)
            new_mem = _read_write_step(
                relu_kind, S_real, kb, kbp, kbw1b, memory, control,
                wmem_ref, bmem_ref, w1a_ref, w2_ref, b2_ref,
                wr128, br, w3_ref, b3_ref, smry=smry, kmask=kmask)
            if use_gate:
                z = gates_ref[t]
                new_mem = new_mem * z + memory * (1.0 - z)
            if use_satt:
                hist_ref[pl.ds(t + 1, 1)] = new_mem[None]
            if with_mem_hist:
                memhist_ref[pl.ds(t, 1)] = new_mem[None]
            return new_mem

        out_ref[...] = jax.lax.fori_loop(0, T, step, mem0_ref[...])

    return kernel


def _build_feedprev_kernel(T: int, relu_kind: str, S_real: int,
                           use_gate: bool, feed_prev_att: bool,
                           cont_act: str, gate_bias: float,
                           with_kb_mask: bool = False):
    """Kernel body for args1 (controlFeedPrev): the control recurrence is
    sequential, so the control unit runs in-loop over VMEM-resident words.
    The ci half of the contControl projection (+ its bias) and the shared
    per-step question projections arrive precomputed ([T, Bt, d])."""

    def kernel(*refs):
        it = iter(refs)
        kb_ref = next(it)
        kmask_ref = next(it) if with_kb_mask else None   # [Bt, Sp] f32
        words_ref = next(it)                      # [Bt, L, d]
        wmask_ref = next(it)                      # [Bt, L] f32 additive
        ciproj_ref = next(it)                     # [T, Bt, d]
        ctrl0_ref = next(it)
        mem0_ref = next(it)
        wpx_ref, bpx_ref, w1b_ref, b1_ref = (next(it) for _ in range(4))
        wcc_ref, wcc2_ref, bcc2_ref = (next(it) for _ in range(3))
        wq_ref, bq_ref = next(it), next(it)
        wmem_ref, bmem_ref, w1a_ref, w2_ref, b2_ref = (
            next(it) for _ in range(5))
        wr_ref, br_ref, w3_ref, b3_ref = (next(it) for _ in range(4))
        wg_ref = next(it) if use_gate else None
        bg_ref = next(it) if use_gate else None
        out_ref = next(it)

        Bt, Sp, d = kb_ref.shape
        dtype = kb_ref.dtype
        kb = kb_ref[...]
        kmask = kmask_ref[...] if with_kb_mask else None
        kbp, kbw1b = _project_kb_in_kernel(kb, wpx_ref, bpx_ref,
                                           w1b_ref, b1_ref)
        words = words_ref[...]
        wmask = wmask_ref[...]
        wq = wq_ref[...]
        bq = bq_ref[0, 0]
        wr128 = wr_ref[...]
        br = br_ref[0, 0]

        def step(t, carry):
            control, cont_control, memory = carry

            # ---- control unit with recurrent merge
            # (reference: mac_cell.py:142-181)
            sel = control if feed_prev_att else cont_control
            pre = _dot(sel, wcc_ref[...]).astype(dtype) + ciproj_ref[t]
            cc = _act(pre, cont_act)
            # the act-layer second linear of the contControl projection
            # (reference: ops.py:325-328)
            if cont_act != "NON":
                cc = (_dot(cc, wcc2_ref[...])
                      + bcc2_ref[...]).astype(dtype)
            u = cc * wq[None, :]
            qlog = (jnp.sum(words * u[:, None, :], axis=-1)
                    .astype(jnp.float32) + bq + wmask)
            qatt = _softmax_f32(qlog).astype(dtype)
            new_control = jnp.sum(qatt[:, :, None] * words, axis=1)

            new_mem = _read_write_step(
                relu_kind, S_real, kb, kbp, kbw1b, memory, new_control,
                wmem_ref, bmem_ref, w1a_ref, w2_ref, b2_ref,
                wr128, br, w3_ref, b3_ref, kmask=kmask)
            if use_gate:
                z = jax.nn.sigmoid(
                    (_dot(new_control, wg_ref[...]) + bg_ref[...]
                     + gate_bias).astype(jnp.float32)).astype(dtype)
                new_mem = new_mem * z + memory * (1.0 - z)
            return new_control, cc, new_mem

        init = (ctrl0_ref[...], ctrl0_ref[...], mem0_ref[...])
        _, _, memory = jax.lax.fori_loop(0, T, step, init)
        out_ref[...] = memory

    return kernel


# --------------------------------------------------------------- dispatcher

def fused_mac_steps(cfg: Config, weights: Dict[str, jnp.ndarray],
                    kb, mem0,
                    controls=None, gates=None, satt=None,
                    words=None, wmask=None, ci_proj=None, ctrl0=None,
                    kb_lengths=None,
                    s_real: Optional[int] = None,
                    batch_tile: int = 8,
                    interpret: Optional[bool] = None,
                    with_memories: bool = False,
                    mesh=None, data_axis: str = "data"):
    """Run the full netLength recurrence as one Pallas kernel.

    kb: [B, S, d] (S may be unpadded; padded here); mem0: [B, d].  The
    hoisted KB projections (projX and the concat-half of the first read
    matmul) are computed INSIDE the kernel, once per tile, from
    ``weights`` entries "wpx"/"bpx"/"w1b"/"b1" — the kernel DMAs only kb
    and skips the HBM round-trip of two more [B, S, d] tensors.
    Non-feedPrev path: controls [T, B, d], optional
    gates [T, B, d] (sigmoid applied, gateBias folded), optional satt
    [T, T, B] f32 (softmaxed self-attention weights over history slots).
    feedPrev path: words [B, L, d], wmask [B, L] f32 additive,
    ci_proj [T, B, d], ctrl0 [B, d].  kb_lengths: optional [B] int —
    per-example valid KB-slot counts (GQA object features); padded slots
    get an additive NEG_INF in the read softmax, matching the XLA path's
    masked_softmax.  Returns final memory [B, d] — or
    (final memory, per-step memory history [T, B, d]) when
    ``with_memories`` (non-feedPrev only; the debug-outputs path).

    ``mesh``: a jax.sharding.Mesh partitions the kernel over its
    ``data_axis`` with shard_map — each device runs the pallas_call on
    its batch shard and NO collectives touch the KB-sized operands
    (XLA's default handling of an opaque custom call is to all-gather
    its inputs; shard_map replaces that with true data parallelism —
    the working completion of the reference's towers, model.py:776-824).
    B must divide by the mesh's data-axis size.
    """
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        n = mesh.shape[data_axis]
        assert kb.shape[0] % n == 0, (
            f"batch {kb.shape[0]} must divide the '{data_axis}' mesh axis "
            f"({n})")
        S_real_g = s_real if s_real is not None else kb.shape[1]

        def inner(weights, kb, mem0, controls, gates, satt, words, wmask,
                  ci_proj, ctrl0, kb_lengths):
            return fused_mac_steps(
                cfg, weights, kb, mem0, controls=controls, gates=gates,
                satt=satt, words=words, wmask=wmask, ci_proj=ci_proj,
                ctrl0=ctrl0, kb_lengths=kb_lengths, s_real=S_real_g,
                batch_tile=batch_tile, interpret=interpret,
                with_memories=with_memories)

        bspec = lambda axis: P(*([None] * axis + [data_axis]))
        in_specs = (P(), bspec(0), bspec(0), bspec(1), bspec(1), bspec(2),
                    bspec(0), bspec(0), bspec(1), bspec(0), bspec(0))
        out_specs = ((bspec(0), bspec(1)) if with_memories else bspec(0))
        return shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)(weights, kb, mem0, controls, gates, satt,
                             words, wmask, ci_proj, ctrl0, kb_lengths)
    if with_memories and cfg.controlFeedPrev:
        raise NotImplementedError(
            "memory-history output is not supported for the feedprev "
            "kernel; use the XLA path for getAtt on controlFeedPrev configs")
    B, S, d = kb.shape
    S_real = s_real if s_real is not None else S
    T = cfg.netLength
    dtype = kb.dtype

    _BATCH_AXES = dict(kb=0, mem0=0, controls=1, gates=1,
                       satt=2, words=0, wmask=0, ci_proj=1, ctrl0=0,
                       kb_lengths=0)

    # TPU lowering needs the batch tile (a sublane dim) to be a multiple
    # of 8: pad ragged batches with zero rows and slice the output.  The
    # zero rows produce garbage memories that are discarded; they cannot
    # NaN (the read softmax's +1e-30 keeps all-underflow rows at zero).
    if B % 8:
        Bp = _round_up(B, 8)
        args = dict(kb=kb, mem0=mem0,
                    controls=controls, gates=gates, satt=satt, words=words,
                    wmask=wmask, ci_proj=ci_proj, ctrl0=ctrl0,
                    kb_lengths=kb_lengths)
        def padb(x, axis):
            if x is None:
                return None
            pads = [(0, 0)] * x.ndim
            pads[axis] = (0, Bp - B)
            return jnp.pad(x, pads)
        # kb_lengths pad rows are 0 -> clamped to slot 0 of the
        # zero-padded KB (info == 0); those rows are discarded anyway
        padded = {k: padb(v, _BATCH_AXES[k]) for k, v in args.items()}
        kw = {k: padded[k] for k in
              ("controls", "gates", "satt", "words", "wmask",
               "ci_proj", "ctrl0", "kb_lengths")}
        out = fused_mac_steps(
            cfg, weights, padded["kb"], padded["mem0"], s_real=S_real,
            batch_tile=batch_tile, interpret=interpret,
            with_memories=with_memories, **kw)
        if with_memories:
            return out[0][:B], out[1][:, :B]
        return out[:B]

    # very large batches run as unrolled chunks (one pallas_call each; equal
    # chunks reuse the same compiled program, a ragged tail compiles once
    # more; lax.map over a pallas_call trips the remote-compile toolchain,
    # so a plain Python loop it is)
    if B > _MAX_CALL_BATCH:
        c = _MAX_CALL_BATCH
        axes = _BATCH_AXES
        args = dict(kb=kb, mem0=mem0,
                    controls=controls, gates=gates, satt=satt, words=words,
                    wmask=wmask, ci_proj=ci_proj, ctrl0=ctrl0,
                    kb_lengths=kb_lengths)
        def sl(x, axis, lo, hi):
            if x is None:
                return None
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(lo, hi)
            return x[tuple(idx)]
        outs = []
        for lo in range(0, B, c):
            hi = min(lo + c, B)
            part = {k: sl(v, axes[k], lo, hi) for k, v in args.items()}
            kw = {k: part[k] for k in
                  ("controls", "gates", "satt", "words", "wmask",
                   "ci_proj", "ctrl0", "kb_lengths")}
            outs.append(fused_mac_steps(
                cfg, weights, part["kb"],
                part["mem0"], s_real=S_real, batch_tile=batch_tile,
                interpret=interpret, with_memories=with_memories, **kw))
        if with_memories:
            return (jnp.concatenate([o[0] for o in outs], axis=0),
                    jnp.concatenate([o[1] for o in outs], axis=1))
        return jnp.concatenate(outs, axis=0)

    Bt = batch_tile
    while B % Bt:
        Bt //= 2
    # TPU lowering: 2-D block sublane dim must be a multiple of 8
    Bt = max(Bt, 8) if B % 8 == 0 else B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pad the KB axis to the sublane tile so the per-step
    # [Bt, S, d] <-> [Bt*S, d] reshapes are layout-trivial
    Sp = _round_up(S, _sublane(dtype))
    if Sp != S:
        kb = jnp.pad(kb, ((0, 0), (0, Sp - S), (0, 0)))

    w = {k: v.astype(dtype) for k, v in weights.items()
         if k not in ("bq", "br")}
    br = weights["br"].reshape(1, 1).astype(jnp.float32)
    # read-logits vector weight broadcast across an MXU lane tile
    wr128 = jnp.broadcast_to(w["wr"][:, None], (d, 128))

    feed_prev = cfg.controlFeedPrev
    use_gate = cfg.writeGate
    use_satt = (satt is not None)

    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    step_tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0, i) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)

    in_specs = [tile(Bt, Sp, d)]
    inputs = [kb]
    scratch_shapes = []

    with_kb_mask = kb_lengths is not None
    if with_kb_mask:
        # fold the per-example valid-slot count AND the static Sp/S_real
        # padding into one additive f32 mask, computed once in the glue.
        # Clamped to >= 1 so a zero-object image attends to slot 0 (a zero
        # feature row) exactly like the XLA path (mac_cell.py read unit)
        lim = jnp.clip(kb_lengths.astype(jnp.int32), 1, S_real)
        kmask = jnp.where(jnp.arange(Sp)[None, :] < lim[:, None],
                          0.0, NEG_INF).astype(jnp.float32)
        in_specs.append(tile(Bt, Sp))
        inputs.append(kmask)

    if not feed_prev:
        kernel_fn = _build_hoisted_kernel(T, cfg.relu, S_real, use_gate,
                                          use_satt,
                                          with_mem_hist=with_memories,
                                          with_kb_mask=with_kb_mask)
        in_specs.append(step_tile(T, Bt, d))
        inputs.append(controls.astype(dtype))
        if use_gate:
            in_specs.append(step_tile(T, Bt, d))
            inputs.append(gates.astype(dtype))
        if use_satt:
            in_specs.append(pl.BlockSpec((T, T, Bt), lambda i: (0, 0, i),
                                         memory_space=pltpu.VMEM))
            inputs.append(satt.astype(jnp.float32))
            scratch_shapes.append(pltpu.VMEM((T + 1, Bt, d), dtype))
        in_specs.append(tile(Bt, d))
        inputs.append(mem0)
        for key in ("wpx", "bpx", "w1b", "b1",
                    "wmem", "bmem", "w1a", "w2", "b2"):
            in_specs.append(full())
            inputs.append(w[key])
        in_specs += [full(), smem(), full(), full()]
        inputs += [wr128, br, w["w3"], w["b3"]]
    else:
        L = words.shape[1]
        # controlContAct == "RELU" dispatches through cfg.relu in the XLA
        # path (activations.apply_act_fn); mirror that here so e.g.
        # relu='ELU' computes ELU, not plain max(x, 0)
        cont_act = cfg.relu if cfg.controlContAct == "RELU" \
            else cfg.controlContAct
        kernel_fn = _build_feedprev_kernel(
            T, cfg.relu, S_real, use_gate, cfg.controlFeedPrevAtt,
            cont_act, float(cfg.writeGateBias), with_kb_mask=with_kb_mask)
        in_specs += [tile(Bt, L, d), tile(Bt, L),
                     step_tile(T, Bt, d), tile(Bt, d), tile(Bt, d)]
        inputs += [words.astype(dtype), wmask.astype(jnp.float32),
                   ci_proj.astype(dtype), ctrl0.astype(dtype), mem0]
        for key in ("wpx", "bpx", "w1b", "b1"):
            in_specs.append(full())
            inputs.append(w[key])
        for key in ("wcc", "wcc2", "bcc2"):
            in_specs.append(full())
            inputs.append(w.get(key, jnp.zeros((1,), dtype)))
        in_specs += [full(), smem()]
        inputs += [w["wq"], weights["bq"].reshape(1, 1).astype(jnp.float32)]
        for key in ("wmem", "bmem", "w1a", "w2", "b2"):
            in_specs.append(full())
            inputs.append(w[key])
        in_specs += [full(), smem(), full(), full()]
        inputs += [wr128, br, w["w3"], w["b3"]]
        if use_gate:
            in_specs += [full(), full()]
            inputs += [w["wg"], w["bg"]]

    flops_per_tile = (T * (Bt * Sp * d * d * 2 * 2 + Bt * d * d * 2 * 3)
                      + Bt * Sp * d * d * 2 * 2)   # + in-kernel projections
    # "arbitrary" grid semantics (each tile runs all T reasoning steps, so
    # there is nothing to pipeline across grid cells) + a raised VMEM
    # budget: the compiler's default 16MB *scoped* limit is far below the
    # physical VMEM on v5e, and the KB tile (plus its two in-kernel
    # projections) kept resident across the T steps is the whole point
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)
    out_shape = jax.ShapeDtypeStruct((B, d), dtype)
    out_specs = tile(Bt, d)
    if with_memories:
        out_shape = [out_shape, jax.ShapeDtypeStruct((T, B, d), dtype)]
        out_specs = [out_specs, step_tile(T, Bt, d)]
    out = pl.pallas_call(
        kernel_fn,
        out_shape=out_shape,
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * (B // Bt),
            bytes_accessed=B * Sp * d * 2,
            transcendentals=T * B * Sp),
    )(*inputs)
    if with_memories:
        return out[0], out[1]
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
        "wpx": read["projX"]["weight"],
        "bpx": read["projX"]["bias"],
        "wmem": read["projY"]["weight"],
        "bmem": read["projY"]["bias"],
        "w1a": w1[:d], "w1b": w1[d:], "b1": read["memKbProj"]["bias"],
        "w2": read["memKbProj"]["linear_2"]["weight"],
        "b2": read["memKbProj"]["linear_2"]["bias"],
        "wr": read["inter2logits"]["logits"]["weight"],
        "br": read["inter2logits"]["logits"]["bias"],
        "w3": cell["write"]["newMemory"]["weight"],   # [2d or 3d, d]
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
    if cfg.writeSelfAtt:
        out["w_sa"] = cell["write"]["selfAttention"]["logits"]["weight"]
        out["b_sa"] = cell["write"]["selfAttention"]["logits"]["bias"]
        out["w_cp"] = cell["write"]["ctrlProj"]["weight"]
        out["b_cp"] = cell["write"]["ctrlProj"]["bias"]
    if cfg.controlFeedPrev:
        cc = cell["control"]["contControl"]
        out["wcc_full"] = cc["weight"]
        out["bcc"] = cc["bias"]
        if cfg.controlContAct != "NON":
            out["wcc2"] = cc["linear_2"]["weight"]
            out["bcc2"] = cc["linear_2"]["bias"]
    return out


class FusedMACEngine:
    """Serving-path forward: XLA for embeddings/encoder/stem/output — plus
    everything loop-independent in the recurrence (all controls, write
    gates, self-attention weights, the hoisted KB projections) — and the
    fused Pallas kernel for the sequential memory chain.

    Produces logits identical (within bf16 tolerance) to
    ``MACNetwork.apply(train=False)`` for supported configs.
    """

    def __init__(self, cfg: Config, embedding_init, batch_tile: int = 16,
                 mesh=None, data_axis: str = "data"):
        from mac_network_tpu.models.mac_network import (
            QuestionEncoder, Stem, OutputUnit, Classifier)
        from mac_network_tpu.ops.pallas.lstm_fused import (
            supports_fused_encoder)
        assert supports_fused_config(cfg), \
            "config outside the fused-kernel envelope; use the XLA path"
        self.cfg = cfg
        self.batch_tile = batch_tile
        # a Mesh partitions the pallas calls over its data axis via
        # shard_map (the XLA glue partitions via GSPMD as usual)
        self.mesh = mesh
        self.data_axis = data_axis
        self.embedding_init = embedding_init
        self.encoder = QuestionEncoder(cfg, embedding_init)
        # the bi-LSTM runs as a fused Pallas kernel when the layer shape
        # allows; encoder projections with a non-NON activation keep the
        # XLA encoder (the act-layer quirk lives there)
        self._fused_enc = (supports_fused_encoder(cfg)
                           and cfg.encProjQAct == "NON")
        self.stem = Stem(cfg)
        self.output = OutputUnit(cfg)
        self.classifier = Classifier(cfg)

    def _encode(self, params, question_ids, lengths, interpret):
        """Question input unit: XLA embedding lookup + fused Pallas
        bi-LSTM (mirrors QuestionEncoder, reference model.py:242-307)."""
        cfg = self.cfg
        if not self._fused_enc:
            return self.encoder.apply(
                {"params": params["qEmbeddings"]}, question_ids, lengths,
                train=False)
        from mac_network_tpu.ops.pallas.lstm_fused import fused_bilstm
        dtype = jnp.bfloat16 if cfg.computeDtype == "bfloat16" else jnp.float32
        enc = params["qEmbeddings"]
        table = jnp.concatenate(
            [jnp.zeros((1, cfg.wrdEmbDim), enc["emb"].dtype), enc["emb"]],
            axis=0)
        words = jnp.take(table, question_ids, axis=0).astype(dtype)
        a_emb = None
        if cfg.ansEmbMod == "SHARED":
            ans_map = jnp.asarray(
                np.asarray(self.embedding_init["ansMap"], np.int32))
            a_emb = jnp.take(table, ans_map, axis=0).astype(dtype)
        elif cfg.ansEmbMod == "BOTH":
            a_emb = enc["aEmb"].astype(dtype)
        cntx, vec = fused_bilstm(cfg, enc["rnn0"], words, lengths,
                                 interpret=interpret, mesh=self.mesh,
                                 data_axis=self.data_axis)
        if (cfg.encDim != cfg.ctrlDim) or cfg.encProj:
            cntx = _apply_linear(cntx, enc["projCW"])
            vec = _apply_linear(vec, enc["projQ"])
        return words, cntx, vec, a_emb

    def _kb_attentions(self, weights, kb, mem0, mem_hist, controls,
                       kb_lengths=None):
        """Recompute the per-step KB read attention (reference:
        mac_cell.py:209-277) in XLA from the kernel's memory-history debug
        output: the read attention at step t is a closed function of
        memory_{t-1} and control_t once the KB projections are known.
        Only runs when attention maps are requested — the fast path never
        pays for it."""
        cfg = self.cfg
        dtype = kb.dtype
        w = {k: weights[k].astype(dtype)
             for k in ("wpx", "bpx", "w1b", "b1", "wmem", "bmem",
                       "w1a", "w2", "b2")}
        dot = lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(dtype)
        kbp = dot(kb, w["wpx"]) + w["bpx"]
        kbw1b = dot(kbp, w["w1b"]) + w["b1"]
        mems = jnp.concatenate([mem0[None], mem_hist[:-1]], axis=0)  # [T,B,d]
        y = dot(mems, w["wmem"]) + w["bmem"]
        inter = kbp[None] * y[:, :, None, :]                 # [T,B,S,d]
        h = dot(inter, w["w1a"]) + kbw1b[None]
        h = _act(h, cfg.relu)
        h = dot(h, w["w2"]) + w["b2"]
        e = _act(h * controls[:, :, None, :], cfg.relu)
        rlog = jnp.einsum(
            "tbsd,d->tbs", e, weights["wr"].astype(dtype),
            preferred_element_type=jnp.float32)
        rlog = rlog + weights["br"].astype(jnp.float32)
        if kb_lengths is not None:
            # the XLA path's masked_softmax (exp_mask additive -1e30);
            # clamp matches the kernels' >= 1 valid-slot floor
            valid = (jnp.arange(rlog.shape[-1])[None, None, :]
                     < jnp.maximum(kb_lengths, 1)[None, :, None])
            rlog = rlog + (1.0 - valid.astype(jnp.float32)) * NEG_INF
        return jax.nn.softmax(rlog, axis=-1)                 # [T,B,S] f32

    def __call__(self, variables: Dict[str, Any], question_ids, lengths,
                 images, interpret: Optional[bool] = None,
                 get_att: bool = False, kb_lengths=None):
        """Serving forward.  With ``get_att`` (non-feedPrev configs only)
        returns (logits, attentions) with the XLA path's schema:
        question [T,B,L], kb [T,B,S], gate [T,B,gateDim] (writeGate),
        self [T,B,T+1] (writeSelfAtt) — reference model.py:732-760.
        kb_lengths: per-example valid KB-slot counts (GQA object
        features) — masks the read attention exactly like the XLA path's
        masked_softmax."""
        cfg = self.cfg
        if get_att and cfg.controlFeedPrev:
            raise NotImplementedError(
                "getAtt with the fused engine requires the hoisted-control "
                "kernels; controlFeedPrev configs serve attentions via the "
                "XLA path")
        params = variables["params"]
        dtype = jnp.bfloat16 if cfg.computeDtype == "bfloat16" else jnp.float32
        images = images.astype(dtype)
        T = cfg.netLength
        d = cfg.memDim

        words_emb, cntx, vec_q, a_emb = self._encode(
            params, question_ids, lengths, interpret)
        kb = self.stem.apply({"params": params["stem"]}, images, train=False)

        mac = params["mac"]
        B = vec_q.shape[0]
        weights = extract_mac_weights(cfg, params)

        # per-step control inputs: qInput -> act -> per-step projection
        # (mirrors MACRecurrence; reference mac_cell.py:442-448)
        shared = _apply_linear(vec_q, mac["qInput"])
        if cfg.controlInputAct == "TANH":
            shared = jnp.tanh(shared)
        elif cfg.controlInputAct == "RELU":
            shared = _act(shared, cfg.relu)
        cis = []
        for i in range(T):
            key = f"qInput{i}" if cfg.controlInputUnshared else "qInputU"
            cis.append(_apply_linear(shared, mac[key]))
        ci = jnp.stack(cis, axis=0)                      # [T, B, d]

        words = cntx if cfg.controlContextual else words_emb
        L = words.shape[1]
        wmask = jnp.where(jnp.arange(L)[None, :] < lengths[:, None],
                          0.0, NEG_INF).astype(jnp.float32)      # [B, L]

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

        # the hoisted KB projections (which the reference re-does every
        # step) are computed INSIDE the kernel from wpx/bpx/w1b/b1 — the
        # glue neither computes nor round-trips them through HBM
        kwargs: Dict[str, Any] = {}
        if cfg.controlFeedPrev:
            # the ci half of the contControl projection is step-local:
            # concat(sel, ci) @ Wcc == sel @ Wcc[:d] + (ci @ Wcc[d:] + bcc)
            wcc_full = weights["wcc_full"].astype(dtype)
            bcc = weights["bcc"].astype(dtype)
            if cfg.controlFeedInputs:
                ci_proj = jnp.dot(ci, wcc_full[d:],
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype) + bcc
            else:
                ci_proj = jnp.broadcast_to(bcc[None, None], (T, B, d))
            weights = dict(weights)
            weights["wcc"] = wcc_full[:d]
            if cfg.controlContAct == "NON":
                weights.setdefault("wcc2", jnp.zeros((d, d), jnp.float32))
                weights.setdefault("bcc2", jnp.zeros((d,), jnp.float32))
            kwargs.update(words=words, wmask=wmask, ci_proj=ci_proj,
                          ctrl0=ctrl0)
        else:
            # ---- hoist the ENTIRE control unit: every step's control is
            # attention of ci_t over the words — loop-independent
            # (reference: mac_cell.py:153-181 with no feedPrev merge)
            wq = weights["wq"].astype(dtype)
            qlog = jnp.einsum("tbd,bld->tbl", ci * wq[None, None, :], words,
                              preferred_element_type=jnp.float32)
            qlog = qlog + weights["bq"].astype(jnp.float32) + wmask[None]
            qatt_f32 = jax.nn.softmax(qlog, axis=-1)
            qatt = qatt_f32.astype(dtype)
            controls = jnp.einsum("tbl,bld->tbd", qatt, words,
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype)
            kwargs["controls"] = controls
            atts: Dict[str, Any] = {"question": qatt_f32}

            if cfg.writeGate:
                # gate weights are a function of the step's control only
                # (reference: mac_cell.py:358-367) — precompute all steps
                gw = weights["wg"].astype(dtype)
                gb = weights["bg"].astype(jnp.float32)
                glog = jnp.dot(controls, gw,
                               preferred_element_type=jnp.float32)
                z = jax.nn.sigmoid(glog + gb + cfg.writeGateBias)
                kwargs["gates"] = jnp.broadcast_to(
                    z.astype(dtype), (T, B, d))
                atts["gate"] = z                       # [T, B, gateDim] f32

            if cfg.writeSelfAtt:
                # self-attention WEIGHTS over the control history are
                # loop-independent too (reference: mac_cell.py:316-330);
                # only the weighted sum over previous memories is not
                sc = ci if cfg.writeSelfAttMod == "CONT" else controls
                scp = jnp.dot(sc, weights["w_cp"].astype(dtype),
                              preferred_element_type=jnp.float32
                              ).astype(dtype) + weights["b_cp"].astype(dtype)
                hist_c = jnp.concatenate([ctrl0[None], controls[:-1]],
                                         axis=0)            # [T, B, d] slots
                w_sa = weights["w_sa"].astype(dtype)
                slog = jnp.einsum("jbd,tbd->tbj", hist_c,
                                  scp * w_sa[None, None, :],
                                  preferred_element_type=jnp.float32)
                slog = slog + weights["b_sa"].astype(jnp.float32)
                # step t attends over history slots j <= t
                step_ids = jnp.arange(T)[:, None, None]
                slot_ids = jnp.arange(T)[None, None, :]
                slog = jnp.where(slot_ids <= step_ids, slog, NEG_INF)
                satt = jax.nn.softmax(slog, axis=-1)         # [T, B, T] f32
                kwargs["satt"] = jnp.transpose(satt, (0, 2, 1))  # [T, T, B]
                # the XLA path pads each step's growing map to the full
                # T+1 history slots (mac_network.py unrolled stacking)
                atts["self"] = jnp.pad(satt, ((0, 0), (0, 0), (0, 1)))

        if get_att:
            final_memory, mem_hist = fused_mac_steps(
                cfg, weights, kb, mem0, batch_tile=self.batch_tile,
                interpret=interpret, with_memories=True,
                kb_lengths=kb_lengths, mesh=self.mesh,
                data_axis=self.data_axis, **kwargs)
            atts["kb"] = self._kb_attentions(
                weights, kb, mem0, mem_hist, controls,
                kb_lengths=kb_lengths)
        else:
            final_memory = fused_mac_steps(
                cfg, weights, kb, mem0,
                batch_tile=self.batch_tile, interpret=interpret,
                kb_lengths=kb_lengths, mesh=self.mesh,
                data_axis=self.data_axis, **kwargs)

        features = self.output.apply({"params": params["output"]},
                                     final_memory, vec_q, images, train=False)
        logits = self.classifier.apply({"params": params["classifier"]},
                                       features, a_emb, train=False)
        if get_att:
            return logits, atts
        return logits


def _apply_linear(x, p):
    w = p["weight"].astype(x.dtype)
    b = p["bias"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b
