"""Fused Pallas TRAINING recurrence for the MAC memory chain (custom VJP).

Round-2 profiling (tools/trace_summary.py on the flagship B=256 train
step) showed `mac/cell/read` at 50.8 ms of the 64.9 ms step — ~4x its
matmul roofline — because the XLA backward streams every step's [B, S, d]
read-chain residuals (inter, h, h2, e) through HBM.  This module removes
that traffic the flash-attention way:

  * **forward kernel**: the serving engine's memory chain (read + write,
    hoisted controls/gates) with the KB tiles and weights VMEM-resident
    across all T steps; the ONLY residual it saves is the tiny per-step
    memory history [T, B, d] (plus the final memory).
  * **backward kernel**: loops t = T-1..0 per batch tile, RECOMPUTES the
    [B, S, d] chain in VMEM from the saved memories, and accumulates
    every gradient in VMEM f32 — weight grads across the whole grid, the
    three KB-sized grads per tile.  HBM traffic for the entire
    recurrence backward is one read of kb/kbp/kbw1 and one write of
    their grads, instead of 16 steps x several tensors each way.
  * dropout (the read unit's y/e dropouts, reference ops.py:686-688 and
    inter2logits dropout, ops.py:120) uses an in-kernel counter-based
    hash RNG (pure vector integer ops — identical under Mosaic and
    interpret mode) so masks are never materialized in HBM and replay
    exactly in the backward.  The RNG *stream* differs from the XLA
    path's threefry/rbg draws — same keep-probabilities, different
    sample — which changes training noise, not semantics (the same
    stance as --prngImpl, PARITY.md).

Envelope (``supports_fused_train``): the serving envelope minus
controlFeedPrev / writeSelfAtt / writeGateShared, with variational
memory dropout (or none).  BOTH KB-dropout semantics are implemented:

  * step-tied masks (--readVariationalDropout): the two KB projections
    hoist out of the recurrence (XLA, once) and enter the kernel
    pre-computed — the fast recipe;
  * the reference's fresh per-step masks (kb_fresh mode, reference
    mac_cell.py:257-260): the kernel draws a fresh KB mask and runs
    BOTH projections in-kernel every step, fwd and bwd — exact
    reference dropout semantics at far less HBM traffic than the XLA
    parity step, whose per-step [B, S, d] projections and their
    residuals all round-trip HBM.

All in-kernel masks are drawn by GLOBAL batch row + per-step salt, so
they are invariant to the grid tiling — the backward runs a smaller
batch tile (VMEM) yet replays the forward's masks exactly.

Reference semantics transcribed: mac_cell.py:209-277 (read),
mac_cell.py:305-375 (write), model.py:447-458 (unrolled recurrence).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mac_network_tpu.config import Config
from mac_network_tpu.ops.pallas.mac_fused import (
    NEG_INF, _act, _round_up, _sublane, supports_fused_config)


def supports_fused_train(cfg: Config) -> bool:
    """Flag envelope the fused training recurrence implements exactly
    (see module docstring for what falls back to the XLA path).  Both
    KB-dropout semantics are covered: step-tied masks
    (--readVariationalDropout, hoisted projections) and the reference's
    fresh per-step masks (in-kernel per-step projections, kb_fresh
    mode)."""
    return (
        supports_fused_config(cfg)
        and not cfg.controlFeedPrev
        and not cfg.writeSelfAtt
        and not (cfg.writeGate and cfg.writeGateShared)
        and cfg.writeDropout >= 1.0
        and (cfg.memoryDropout >= 1.0 or cfg.memoryVariationalDropout)
    )


# ------------------------------------------------------------- in-kernel RNG

def _flat_idx(shape, base):
    """GLOBAL flat element index (int32) of every element in a tile whose
    first element has flat index ``base`` (traced scalar).  Mask draws key
    off this index, so they are invariant to the grid tiling — the
    backward kernel runs a different batch tile than the forward (VMEM)
    and must replay the forward's masks exactly.  Built ONCE per kernel
    invocation (outside the time loop — it is step-invariant; only the
    salt changes per step, which keeps the in-loop RNG to the mix rounds
    instead of rebuilding the index every step)."""
    idx = jnp.full(shape, base, jnp.int32)
    stride = 1
    for axis in range(len(shape) - 1, -1, -1):
        idx = idx + jax.lax.broadcasted_iota(jnp.int32, shape, axis) * stride
        stride *= shape[axis]
    return idx


def _i32(v: int) -> np.int32:                   # wrap to two's complement
    v &= 0xFFFFFFFF
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _mix(idx, salt, extra: int):
    """Counter-based 32-bit mix from pure vector int32 ops (works in
    Mosaic and interpret mode; no pltpu.prng needed).  ``salt`` is a
    traced int32 scalar; ``extra`` a static stream id.  Quality is
    murmur3-finalizer grade — ample for dropout masks."""
    x = idx * jnp.int32(-1640531527)            # 0x9E3779B9 (wraps)
    x = x + jnp.full(idx.shape, salt + _i32(extra * 1315423911), jnp.int32)
    for c in (-862048943, -1028477387):         # murmur3-style mix rounds
        x = x ^ jax.lax.shift_right_logical(x, 16)
        x = x * jnp.int32(c)
    return x ^ jax.lax.shift_right_logical(x, 16)


def _bits_mask(x, shift: int, keep: float, dtype):
    """Inverted-dropout mask (1/keep with prob ``keep`` else 0) from an
    11-bit field of a mixed word.  11 uniform bits quantize the keep
    threshold to 1/2048 — ample resolution for dropout.  The compare runs
    in the INTEGER domain (field < round(keep * 2048)) so the hot path is
    shift / and / compare / select — no int->float convert or float
    multiply on the [Bt, Sp, d] tensor."""
    mant = jax.lax.shift_right_logical(x, shift)
    if shift != 21:                             # not the top field: mask it
        mant = mant & jnp.int32(0x7FF)
    # ceil keeps the draw bit-identical to the former float compare
    # (mant < keep * 2048  <=>  mant < ceil(keep * 2048) for integer mant).
    # The select stays in f32: an i1 mask born from an i32 compare lives in
    # (8,128) tiles and Mosaic cannot relayout it to bf16's (16,128) tiling
    # ("Invalid relayout ... vector<16x512xi1>"), so select-then-convert.
    thresh = jnp.full(x.shape, math.ceil(keep * (1 << 11)), jnp.int32)
    scale = jnp.asarray(1.0 / keep, jnp.float32)
    return jnp.where(mant < thresh, scale, 0.0).astype(dtype)


def _keep_mask(idx, salt, extra: int, keep: float, dtype):
    """One dropout mask keyed by (global element index, salt, stream)."""
    return _bits_mask(_mix(idx, salt, extra), 21, keep, dtype)


def _keep_bit_dyn(x, shift, keep: float):
    """Boolean keep decision from a TRACED shift selecting one of THREE
    disjoint 10-bit fields (bits 0-9 / 10-19 / 20-29) of an already-mixed
    word — the decode half of the windowed draw (_window_keep): one
    murmur mix serves three consecutive steps' masks, tripling the RNG
    amortization.  Returns the PREDICATE, not a scaled mask: the 1/keep
    scale is folded into wr on the host (_prep_weights) so the apply is a
    single select instead of mask-materialize + multiply.  The field is
    compared IN PLACE — (x & (0x3FF << s)) < (thresh << s) — so the
    decode is one broadcast AND + one compare, never a full-tensor shift;
    bits 30-31 stay unused, keeping every masked field non-negative under
    the signed compare.  10 uniform bits quantize the keep threshold to
    1/1024 — still ample for dropout."""
    field = jax.lax.shift_left(jnp.int32(0x3FF), shift)
    thresh = jax.lax.shift_left(
        jnp.int32(math.ceil(keep * (1 << 10))), shift)
    return (x & field) < thresh


def _window_keep(mix_ref, idx3, seed, t, store_pred, keep: float):
    """Tied-mode e-dropout keep bit, windowed x3: one _mix per THREE
    steps held in a VMEM scratch (``mix_ref``), each step decoding its
    own disjoint 10-bit field.  ``store_pred`` is True on iterations that
    ENTER a new window (t % 3 == 0 walking forward; t % 3 == 2 or the
    first iteration walking backward), so the forward and backward
    kernels replay identical masks in opposite directions.  Masks stay
    keyed by GLOBAL element index (idx3) + per-window salt, so they
    remain invariant to the grid tiling."""
    w, j = t // 3, t % 3
    salt_w = seed + w * jnp.int32(9973)

    @pl.when(store_pred)
    def _():
        mix_ref[...] = _mix(idx3, salt_w, 2)

    return _keep_bit_dyn(mix_ref[...], j * jnp.int32(10), keep)


def _keep_bit_pair(idx, salt, extra: int, keep: float):
    """TWO independent dropout keep PREDICATES from ONE mix (bit fields
    0..10 and 11..21, both sign-free so the field compares in place:
    (x & (0x7FF << s)) < (thresh << s), one AND + one compare, no shift
    or select on the [Bt, Sp, d] tensor).  The mask draws run inside the
    time loop and are re-drawn during the backward's recompute — so the
    fresh-KB chain's two same-shaped masks share a single hash, and the
    1/keep inverted-dropout scales live in the host-folded wpx / wr
    weights (_prep_weights) rather than in a materialized mask."""
    x = _mix(idx, salt, extra)
    thresh = math.ceil(keep * (1 << 11))

    def bit(s):
        return (x & jnp.int32(0x7FF << s)) < jnp.int32(thresh << s)

    return bit(0), bit(11)


# ------------------------------------------------------------------ kernels

def _fwd_chain(t, memory, kb, kbp, kbw1, ctrl, mem_mask, salt, idx3, idx2,
               wy, by, w1a, w2, b2, wr128, br, pad_mask,
               relu_kind, read_keep, dtype, kb_proj=None, e_keep_pre=None):
    """Recompute (or compute) one step's read chain from the step-entry
    memory.  Returns every intermediate the backward needs.  ``salt`` is
    tile-independent (per-step only); ``idx3``/``idx2`` are the
    loop-invariant GLOBAL flat-index arrays ([Bt, Sp, d] / [Bt, d],
    built once per kernel by _flat_idx), so every mask draw is invariant
    to the grid tiling (the backward runs a different tile and must
    replay the forward's masks).

    ``kb_proj``: fresh-KB (exact reference parity) mode — a tuple
    (wpx, bpx, w1b, b1); kbp/kbw1 args are then None and both KB
    projections are computed HERE each step from a fresh per-step KB
    dropout mask (reference mac_cell.py:257-260: xx = dropout(KB) then
    projX, re-drawn every step), instead of arriving pre-hoisted with the
    step-tied mask.
    Reference: mac_cell.py:209-277 with the train-time dropouts."""
    Bt, Sp, d = kb.shape
    kb_keep = None
    e_keep = e_keep_pre                         # tied mode: windowed draw,
    if kb_proj is not None:                     # 1/keep pre-folded into wr
        wpx, bpx, w1b, b1 = kb_proj
        if read_keep < 1.0:
            # one mix feeds BOTH same-shaped masks of the fresh-KB chain;
            # the 1/keep scales are host-folded into wpx / wr, so each
            # apply is a single select
            kb_keep, e_keep = _keep_bit_pair(idx3, salt, 2, read_keep)
            xx = jnp.where(kb_keep, kb, jnp.asarray(0.0, dtype))
        else:
            xx = kb
        kbp_f = (jnp.dot(xx.reshape(Bt * Sp, d), wpx,
                         preferred_element_type=jnp.float32
                         ).astype(dtype) + bpx)
        kbw1_f = (jnp.dot(kbp_f, w1b,
                          preferred_element_type=jnp.float32
                          ).astype(dtype) + b1)
        kbp = kbp_f.reshape(Bt, Sp, d)
        kbw1 = kbw1_f.reshape(Bt, Sp, d)
    else:
        xx = None
    m_in = memory * mem_mask                    # variational memory dropout
    if read_keep < 1.0:
        y_mask = _keep_mask(idx2, salt, 1, read_keep, dtype)
        y0 = m_in * y_mask
    else:
        y_mask = None
        y0 = m_in
    # NB: cast each matmul back to the compute dtype BEFORE adding the
    # bf16 bias — adding a bf16 broadcast into an f32 accumulator makes
    # Mosaic convert a replicated-layout vector, which it cannot relayout
    y = jnp.dot(y0, wy,
                preferred_element_type=jnp.float32).astype(dtype) + by
    inter2 = (kbp * y[:, None, :]).reshape(Bt * Sp, d)
    h = (jnp.dot(inter2, w1a, preferred_element_type=jnp.float32)
         .astype(dtype) + kbw1.reshape(Bt * Sp, d))
    a = _act(h, relu_kind)
    h2 = (jnp.dot(a, w2, preferred_element_type=jnp.float32)
          .astype(dtype) + b2)
    e_pre = h2.reshape(Bt, Sp, d) * ctrl[:, None, :]
    e = _act(e_pre, relu_kind)
    if read_keep < 1.0:              # single select, 1/keep scale is in wr
        e_drop = jnp.where(e_keep, e, jnp.asarray(0.0, dtype))
    else:
        e_drop = e
    r = jnp.dot(e_drop.reshape(Bt * Sp, d), wr128,
                preferred_element_type=jnp.float32)     # [Bt*Sp, 128] f32
    rl = r.reshape(Bt, Sp, 128) + br + pad_mask
    ex = jnp.exp(jnp.minimum(rl, 80.0))
    sm = jnp.sum(ex, axis=1, keepdims=True)
    # normalize via a tiny [Bt, 1, 128] reciprocal + broadcast multiply —
    # a full-tensor f32 divide on [Bt, Sp, 128] is several VPU passes
    att3 = ex * (1.0 / (sm + 1e-30))                    # [Bt, Sp, 128] f32
    attd = att3[:, :, :1].astype(dtype)                 # [Bt, Sp, 1]
    info = jnp.sum(attd * kb, axis=1).astype(dtype)     # [Bt, d]
    return dict(m_in=m_in, y_mask=y_mask, y0=y0, y=y, inter2=inter2,
                h=h, a=a, h2=h2, e_pre=e_pre, e=e,
                e_keep=e_keep, e_drop=e_drop, attd=attd, info=info,
                xx=xx, kbp=kbp, kb_keep=kb_keep)


def _act_grad(pre, out, relu_kind, dtype):
    """d act / d pre from the (recomputed) activation OUTPUT, compare-free
    and exp-free where possible.  ELU': exp(x) = elu(x)+1 for x <= 0 and
    1 for x > 0, i.e. exactly min(out + 1, 1) — an add+min instead of a
    transcendental (the backward kernel calls this on [Bt, Sp, d] tensors
    every step, so the exp is measurable VPU time)."""
    one = jnp.asarray(1.0, dtype)
    if relu_kind == "ELU":
        return jnp.minimum(out + one, one)
    if relu_kind == "TANH":
        return (one - out * out)
    if relu_kind == "NON":
        return jnp.ones_like(pre)
    # STD: 1 where pre > 0 else 0 == max(sign(pre), 0)
    return jnp.maximum(jnp.sign(pre), jnp.asarray(0.0, dtype))


def _build_train_fwd_kernel(T, relu_kind, S_real, use_gate, read_keep,
                            kb_fresh, with_kb_mask=False):
    windowed = read_keep < 1.0 and not kb_fresh

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it)                    # SMEM [1]
        kb_ref = next(it)
        kmask_ref = next(it) if with_kb_mask else None   # [Bt, Sp] f32
        if kb_fresh:
            kbp_ref = kbw1_ref = None
        else:
            kbp_ref, kbw1_ref = next(it), next(it)
        ctrl_ref = next(it)                    # [T, Bt, d]
        gates_ref = next(it) if use_gate else None
        mem0_ref = next(it)
        mask_ref = next(it)                    # [Bt, d] scaled mem mask
        wy_ref, by_ref, w1a_ref, w2_ref, b2_ref = (
            next(it) for _ in range(5))
        if kb_fresh:
            wpx_ref, bpx_ref, w1b_ref, b1_ref = (
                next(it) for _ in range(4))
        wr_ref, br_ref, w3_ref, b3_ref = (next(it) for _ in range(4))
        out_ref = next(it)                     # [Bt, d] final memory
        hist_ref = next(it)                    # [T, Bt, d] step-entry mems
        mix_ref = next(it) if windowed else None  # [Bt, Sp, d] i32 scratch

        Bt, Sp, d = kb_ref.shape
        dtype = kb_ref.dtype
        kb = kb_ref[...]
        if kb_fresh:
            kbp = kbw1 = None
            kb_proj = (wpx_ref[...], bpx_ref[...],
                       w1b_ref[...], b1_ref[...])
        else:
            kbp = kbp_ref[...]
            kbw1 = kbw1_ref[...]
            kb_proj = None
        mem_mask = mask_ref[...]
        wy, w1a, w2 = wy_ref[...], w1a_ref[...], w2_ref[...]
        by = by_ref[...]
        b2 = b2_ref[...]
        wr128 = wr_ref[...]
        br = br_ref[0, 0]
        w3, b3 = w3_ref[...], b3_ref[...]
        i = pl.program_id(0)
        row0 = i * jnp.int32(Bt)
        if read_keep < 1.0:                     # loop-invariant RNG indices
            idx3 = _flat_idx((Bt, Sp, d), row0 * jnp.int32(Sp * d))
            idx2 = _flat_idx((Bt, d), row0 * jnp.int32(d))
        else:
            idx3 = idx2 = None
        if with_kb_mask:
            # per-example valid-slot mask (GQA kb_lengths), S_real folded
            pad_mask = kmask_ref[...][:, :, None]        # [Bt, Sp, 1] f32
        else:
            pad_mask = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1) < S_real,
                0.0, NEG_INF).astype(jnp.float32)

        def step(t, memory):
            hist_ref[pl.ds(t, 1)] = memory[None]
            salt = seed_ref[0] + t * jnp.int32(9973)
            e_keep_pre = None
            if windowed:                       # one mix per 3 steps
                e_keep_pre = _window_keep(mix_ref, idx3, seed_ref[0], t,
                                          t % 3 == 0, read_keep)
            f = _fwd_chain(t, memory, kb, kbp, kbw1, ctrl_ref[t],
                           mem_mask, salt, idx3, idx2, wy, by, w1a, w2, b2,
                           wr128, br, pad_mask, relu_kind, read_keep,
                           dtype, kb_proj=kb_proj, e_keep_pre=e_keep_pre)
            parts = jnp.concatenate([memory, f["info"]], axis=-1)
            new_mem = jnp.dot(parts, w3,
                              preferred_element_type=jnp.float32
                              ).astype(dtype) + b3
            if use_gate:
                z = gates_ref[t]
                new_mem = new_mem * z + memory * (1.0 - z)
            return new_mem

        out_ref[...] = jax.lax.fori_loop(0, T, step, mem0_ref[...])

    return kernel


def _build_train_bwd_kernel(T, relu_kind, S_real, use_gate, read_keep,
                            kb_fresh, with_kb_mask=False):
    windowed = read_keep < 1.0 and not kb_fresh

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it)
        kb_ref = next(it)
        kmask_ref = next(it) if with_kb_mask else None   # [Bt, Sp] f32
        if kb_fresh:
            kbp_ref = kbw1_ref = None
        else:
            kbp_ref, kbw1_ref = next(it), next(it)
        ctrl_ref = next(it)
        gates_ref = next(it) if use_gate else None
        mask_ref = next(it)
        wy_ref, by_ref, w1a_ref, w2_ref, b2_ref = (
            next(it) for _ in range(5))
        if kb_fresh:
            wpx_ref, bpx_ref, w1b_ref, b1_ref = (
                next(it) for _ in range(4))
        wr_ref, br_ref, w3_ref, b3_ref = (next(it) for _ in range(4))
        wr_row_ref = next(it)                  # [1, d] f32
        hist_ref = next(it)                    # [T, Bt, d]
        gout_ref = next(it)                    # [Bt, d] d(final memory)
        # outputs
        gkb_ref = next(it)
        if kb_fresh:
            gkbp_ref = gkbw1_ref = None
        else:
            gkbp_ref, gkbw1_ref = next(it), next(it)
        gctrl_ref = next(it)                   # [T, Bt, d]
        ggate_ref = next(it) if use_gate else None
        gmem0_ref = next(it)
        gmask_ref = next(it)                   # [Bt, d] d(mem_mask)
        gwy_ref, gby_ref, gw1a_ref, gw2_ref, gb2_ref = (
            next(it) for _ in range(5))
        if kb_fresh:
            gwpx_ref, gbpx_ref, gw1b_ref, gb1_ref = (
                next(it) for _ in range(4))
        gwr_ref, gbr_ref, gw3_ref, gb3_ref = (next(it) for _ in range(4))
        mix_ref = next(it) if windowed else None  # [Bt, Sp, d] i32 scratch

        Bt, Sp, d = kb_ref.shape
        dtype = kb_ref.dtype
        kb = kb_ref[...]
        if kb_fresh:
            kbp = kbw1 = None
            kb_proj = (wpx_ref[...], bpx_ref[...],
                       w1b_ref[...], b1_ref[...])
        else:
            kbp = kbp_ref[...]
            kbw1 = kbw1_ref[...]
            kb_proj = None
        mem_mask = mask_ref[...]
        wy, w1a, w2 = wy_ref[...], w1a_ref[...], w2_ref[...]
        by = by_ref[...]
        b2 = b2_ref[...]
        wr128 = wr_ref[...]
        wr_row = wr_row_ref[...]                        # [1, d] f32
        br = br_ref[0, 0]
        w3, b3 = w3_ref[...], b3_ref[...]
        i = pl.program_id(0)
        if with_kb_mask:
            # masked slots have zero attention, so every per-slot gradient
            # in the recomputed chain (g_e -> g_h -> g_kbp/g_kb) is zero
            # there automatically — replacing pad_mask is sufficient
            pad_mask = kmask_ref[...][:, :, None]        # [Bt, Sp, 1] f32
        else:
            pad_mask = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1) < S_real,
                0.0, NEG_INF).astype(jnp.float32)

        # weight-grad accumulators are shared across grid cells
        # ("arbitrary" semantics keeps the (0,..) blocks resident):
        # zero them on the first cell only
        weight_grad_refs = [gwy_ref, gby_ref, gw1a_ref, gw2_ref, gb2_ref,
                            gwr_ref, gbr_ref, gw3_ref, gb3_ref]
        if kb_fresh:
            weight_grad_refs += [gwpx_ref, gbpx_ref, gw1b_ref, gb1_ref]

        @pl.when(i == 0)
        def _init():
            for ref in weight_grad_refs:
                ref[...] = jnp.zeros_like(ref)

        f32 = jnp.float32
        zero3 = jnp.zeros((Bt, Sp, d), f32)
        zero2 = jnp.zeros((Bt, d), f32)
        row0 = i * jnp.int32(Bt)
        if read_keep < 1.0:                     # loop-invariant RNG indices
            idx3 = _flat_idx((Bt, Sp, d), row0 * jnp.int32(Sp * d))
            idx2 = _flat_idx((Bt, d), row0 * jnp.int32(d))
        else:
            idx3 = idx2 = None

        def step(k, carry):
            t = T - 1 - k
            (g_mem, gkb_a, gkbp_a, gkbw1_a, gmask_a,
             gwy_a, gby_a, gw1a_a, gw2_a, gb2_a, gwr_a, gbr_a,
             gw3_a, gb3_a, gpx_a) = carry
            memory = hist_ref[t]
            ctrl = ctrl_ref[t]
            salt = seed_ref[0] + t * jnp.int32(9973)
            e_keep_pre = None
            if windowed:                       # replay the fwd's windowed
                # draws walking BACKWARD: refresh the mix on entering a
                # new window (t % 3 == 2) and on the first iteration
                e_keep_pre = _window_keep(mix_ref, idx3, seed_ref[0], t,
                                          (t % 3 == 2) | (k == 0),
                                          read_keep)
            f = _fwd_chain(t, memory, kb, kbp, kbw1, ctrl, mem_mask, salt,
                           idx3, idx2, wy, by, w1a, w2, b2, wr128, br,
                           pad_mask, relu_kind, read_keep, dtype,
                           kb_proj=kb_proj, e_keep_pre=e_keep_pre)

            # ---- write unit backward (reference: mac_cell.py:333-367)
            parts = jnp.concatenate([memory, f["info"]], axis=-1)
            if use_gate:
                z = gates_ref[t]
                nm = jnp.dot(parts, w3,
                             preferred_element_type=jnp.float32
                             ).astype(dtype) + b3
                g_nm = (g_mem * z).astype(dtype)
                g_z = (g_mem.astype(f32)
                       * (nm - memory).astype(f32))
                ggate_ref[pl.ds(t, 1)] = g_z.astype(dtype)[None]
                g_mem_direct = (g_mem * (1.0 - z)).astype(f32)
            else:
                g_nm = g_mem.astype(dtype)
                g_mem_direct = jnp.zeros((Bt, d), f32)
            # every matmul below contracts via dot_general dimension
            # numbers instead of materializing .T (Mosaic lowers the
            # transposed-operand forms natively on the MXU; explicit
            # transposes of [Bt*Sp, d] tiles are real VPU relayouts)
            g_parts = jax.lax.dot_general(
                g_nm, w3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gw3_a = gw3_a + jax.lax.dot_general(
                parts, g_nm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gb3_a = gb3_a + jnp.sum(g_nm.astype(f32), axis=0,
                                    keepdims=True)
            g_mem_w = g_parts[:, :d]
            g_info = g_parts[:, d:].astype(dtype)       # [Bt, d]

            # ---- info = sum_s att * kb
            gkb_a = gkb_a + (f["attd"].astype(f32)
                             * g_info[:, None, :].astype(f32))
            # g_att[b,s] = sum_d kb[b,s,d] * g_info[b,d]: a 512-way
            # cross-lane VPU reduce per element if done as sum(kb*g_info).
            # Instead run ONE small MXU matmul against ALL batch rows'
            # g_info and pick the matching column (6.8 MFLOP vs ~5 ms of
            # lane reduces over the whole loop):
            G = jax.lax.dot_general(
                kb.reshape(Bt * Sp, d), g_info, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [Bt*Sp, Bt]
            G3 = G.reshape(Bt, Sp, Bt)
            own = (jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, Bt), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, Bt), 2))
            g_att = jnp.sum(jnp.where(own, G3, 0.0), axis=-1,
                            keepdims=True)              # [Bt, Sp, 1] f32
            # softmax backward (over the Sp axis)
            attc = f["attd"].astype(f32)                # [Bt, Sp, 1]
            dot_s = jnp.sum(attc * g_att, axis=1, keepdims=True)
            g_r = attc * (g_att - dot_s)                # [Bt, Sp, 1] f32
            gbr_a = gbr_a + jnp.sum(g_r).reshape(1, 1)

            # ---- logits = e_drop . wr
            g_e_drop = (g_r * wr_row[None]).astype(dtype)
            gwr_a = gwr_a + jnp.sum(
                f["e_drop"].astype(f32) * g_r, axis=(0, 1),
                keepdims=True).reshape(1, d)              # [1, d]
            if read_keep < 1.0:                # select mirrors the fwd
                g_e = jnp.where(f["e_keep"], g_e_drop,
                                jnp.asarray(0.0, dtype))
            else:
                g_e = g_e_drop
            # e = act(h2 * ctrl)
            g_epre = g_e * _act_grad(f["e_pre"], f["e"], relu_kind, dtype)
            g_h2 = (g_epre * ctrl[:, None, :]).reshape(Bt * Sp, d)
            # e_pre = h2 * ctrl, so d ctrl = sum_s g_epre * h2
            gctrl_ref[pl.ds(t, 1)] = jnp.sum(
                g_epre * f["h2"].reshape(Bt, Sp, d), axis=1)[None]

            # ---- h2 = act(h) @ w2 + b2
            g_a = jax.lax.dot_general(
                g_h2, w2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
            gw2_a = gw2_a + jax.lax.dot_general(
                f["a"], g_h2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gb2_a = gb2_a + jnp.sum(g_h2.astype(f32), axis=0,
                                    keepdims=True)
            g_h = g_a * _act_grad(f["h"], f["a"], relu_kind, dtype)

            # ---- h = inter2 @ w1a + kbw1
            g_inter2 = jax.lax.dot_general(
                g_h, w1a, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
            gw1a_a = gw1a_a + jax.lax.dot_general(
                f["inter2"], g_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_inter3 = g_inter2.reshape(Bt, Sp, d)
            if kb_fresh:
                # fresh-KB mode: g_h IS d(kbw1) = d(kbp @ w1b + b1); chain
                # through both in-kernel projections back to the raw KB
                wpx_v, _, w1b_v, _ = kb_proj
                (gwpx_a, gbpx_a, gw1b_a, gb1_a) = gpx_a
                kbp_flat = f["kbp"].reshape(Bt * Sp, d)
                gb1_a = gb1_a + jnp.sum(g_h.astype(f32), axis=0,
                                        keepdims=True)
                gw1b_a = gw1b_a + jax.lax.dot_general(
                    kbp_flat, g_h, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g_kbp_w1 = jax.lax.dot_general(
                    g_h, w1b_v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                # ---- inter = kbp * y (the other consumer of kbp)
                g_kbp_flat = ((g_inter3.astype(f32)
                               * f["y"][:, None, :].astype(f32))
                              .astype(dtype).reshape(Bt * Sp, d)
                              + g_kbp_w1)
                gbpx_a = gbpx_a + jnp.sum(g_kbp_flat.astype(f32), axis=0,
                                          keepdims=True)
                gwpx_a = gwpx_a + jax.lax.dot_general(
                    f["xx"].reshape(Bt * Sp, d), g_kbp_flat,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g_xx = jax.lax.dot_general(
                    g_kbp_flat, wpx_v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(Bt, Sp, d)
                if f["kb_keep"] is not None:
                    gkb_a = gkb_a + jnp.where(f["kb_keep"], g_xx, 0.0)
                else:
                    gkb_a = gkb_a + g_xx
                gpx_a = (gwpx_a, gbpx_a, gw1b_a, gb1_a)
            else:
                gkbw1_a = gkbw1_a + g_h.reshape(Bt, Sp, d).astype(f32)
                # ---- inter = kbp * y
                gkbp_a = gkbp_a + (g_inter3.astype(f32)
                                   * f["y"][:, None, :].astype(f32))
            # NB: the Sp-axis reduction result carries a replicated Mosaic
            # layout that convert_element_type cannot relayout — so reduce
            # IN f32 and keep every downstream op f32 (tiny [Bt, d] math)
            prod32 = (g_inter3 * f["kbp"]).astype(f32)
            g_y32 = jnp.sum(prod32, axis=1)                  # [Bt, d] f32

            # ---- y = y0 @ wy + by   (f32 end-to-end; negligible FLOPs)
            g_y0 = jax.lax.dot_general(
                g_y32, wy.astype(f32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # g_y @ wy^T
            gwy_a = gwy_a + jax.lax.dot_general(
                f["y0"].astype(f32), g_y32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # y0^T @ g_y
            gby_a = gby_a + jnp.sum(prod32, axis=(0, 1),
                                    keepdims=True).reshape(1, d)
            if read_keep < 1.0:
                g_min = g_y0 * f["y_mask"].astype(f32)
            else:
                g_min = g_y0
            # m_in = memory * mem_mask
            g_mem_read = g_min * mem_mask.astype(f32)
            gmask_a = gmask_a + g_min * memory.astype(f32)

            g_mem_prev = (g_mem_direct + g_mem_w + g_mem_read).astype(dtype)
            return (g_mem_prev, gkb_a, gkbp_a, gkbw1_a, gmask_a,
                    gwy_a, gby_a, gw1a_a, gw2_a, gb2_a, gwr_a, gbr_a,
                    gw3_a, gb3_a, gpx_a)

        # fresh mode swaps the two KB-sized kbp/kbw1 accumulators for four
        # small projection weight-grad accumulators
        zero_kb = zero2[:, :1] if kb_fresh else zero3
        gpx_init = ((jnp.zeros((d, d), f32), jnp.zeros((1, d), f32),
                     jnp.zeros((d, d), f32), jnp.zeros((1, d), f32))
                    if kb_fresh else ())
        init = (gout_ref[...],
                zero3, zero_kb, zero_kb, zero2,
                jnp.zeros((d, d), f32), jnp.zeros((1, d), f32),
                jnp.zeros((d, d), f32), jnp.zeros((d, d), f32),
                jnp.zeros((1, d), f32), jnp.zeros((1, d), f32),
                jnp.zeros((1, 1), f32),
                jnp.zeros((2 * d, d), f32), jnp.zeros((1, d), f32),
                gpx_init)
        out = jax.lax.fori_loop(0, T, step, init)
        (g_mem0, gkb_a, gkbp_a, gkbw1_a, gmask_a,
         gwy_a, gby_a, gw1a_a, gw2_a, gb2_a, gwr_a, gbr_a,
         gw3_a, gb3_a, gpx_a) = out

        gmem0_ref[...] = g_mem0.astype(dtype)
        gkb_ref[...] = gkb_a.astype(dtype)
        if not kb_fresh:
            gkbp_ref[...] = gkbp_a.astype(dtype)
            gkbw1_ref[...] = gkbw1_a.astype(dtype)
        gmask_ref[...] = gmask_a.astype(dtype)
        # weight grads accumulate across grid cells
        gwy_ref[...] += gwy_a
        gby_ref[...] += gby_a
        gw1a_ref[...] += gw1a_a
        gw2_ref[...] += gw2_a
        gb2_ref[...] += gb2_a
        if read_keep < 1.0:
            # the fwd applied e-dropout as an UNSCALED select (1/keep
            # lives in wr), so the accumulated e_drop . g_r is the grad
            # w.r.t. wr/keep — chain through the host-side fold here
            gwr_a = gwr_a * (1.0 / read_keep)
        gwr_ref[...] += gwr_a
        gbr_ref[...] += gbr_a
        gw3_ref[...] += gw3_a
        gb3_ref[...] += gb3_a
        if kb_fresh:
            gwpx_a, gbpx_a, gw1b_a, gb1_a = gpx_a
            if read_keep < 1.0:
                # same fold for the fresh-KB dropout: xx is an unscaled
                # select and 1/keep lives in wpx
                gwpx_a = gwpx_a * (1.0 / read_keep)
            gwpx_ref[...] += gwpx_a
            gbpx_ref[...] += gbpx_a
            gw1b_ref[...] += gw1b_a
            gb1_ref[...] += gb1_a

    return kernel


# --------------------------------------------------------------- dispatcher

_W_KEYS = ("wy", "by", "w1a", "w2", "b2", "wr", "br", "w3", "b3")
_PX_KEYS = ("wpx", "bpx", "w1b", "b1")


def _pad_b(x, Bp: int, axis: int = 0):
    """Zero-pad a batch axis to Bp rows (callers slice outputs back).
    Zero rows are inert: their forward chain cannot NaN (the read
    softmax's epsilon) and their cotangents are zero, so weight-grad
    accumulators see no contribution from them."""
    if x is None:
        return None
    B = x.shape[axis]
    if B == Bp:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, Bp - B)
    return jnp.pad(x, pads)


def _layout(statics, kb, bwd: bool = False):
    (T, S_real, relu, use_gate, read_keep, kb_fresh, batch_tile,
     interpret) = statics
    B, S, d = kb.shape
    assert B % 8 == 0, f"fused train requires B % 8 == 0, got {B}"
    # the tied-mask backward keeps three KB-sized f32 accumulators per
    # tile in VMEM, so its tile is capped at 8 (Bt=16 measures
    # 139.9M > 128M vmem); the fresh-KB backward keeps only ONE (the
    # projection grads are weight-shaped), so Bt=16 fits — but only in
    # bf16 (f32 chains double every live tensor: Bt=16 f32 measures
    # 145.2M > 128M).  Masks are drawn by GLOBAL batch row, so a
    # different backward tile still replays the forward's dropout exactly
    bwd_cap = 16 if (kb_fresh and kb.dtype == jnp.bfloat16) else 8
    Bt = min(batch_tile, bwd_cap) if bwd else batch_tile
    while B % Bt:
        Bt //= 2
    Bt = max(Bt, 8)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Sp = _round_up(S, _sublane(kb.dtype))
    return B, S, d, Bt, Sp, interpret


def _pad_s(x, Sp):
    B, S, d = x.shape
    if S == Sp:
        return x
    return jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))


def _specs(T, Bt, Sp, d):
    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    step_tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0, i) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    return tile, step_tile, full, smem


def _prep_weights(weights, dtype, d, kb_fresh=False, read_scale=1.0):
    """``read_scale``: under read dropout the kernels apply the masks as
    UNSCALED selects (keep ? x : 0), with the 1/keep inverted-dropout
    scale folded into the weight each dropped tensor feeds — wr for the
    e-dropout, wpx for the fresh-KB dropout.  One [d]/[d,d] host multiply
    replaces a [Bt, Sp, d] VPU pass per step per kernel (and the
    backward un-folds the scale from the accumulated g_wr / g_wpx)."""
    keys = _W_KEYS + (_PX_KEYS if kb_fresh else ())
    w = {k: jnp.asarray(weights[k]).astype(dtype) for k in keys
         if k not in ("br",)}
    wr = jnp.asarray(weights["wr"]).astype(jnp.float32) * read_scale
    w["wr128"] = jnp.broadcast_to(wr.astype(dtype)[:, None], (d, 128))
    if kb_fresh and read_scale != 1.0:
        w["wpx"] = (jnp.asarray(weights["wpx"]).astype(jnp.float32)
                    * read_scale).astype(dtype)
    br = jnp.asarray(weights["br"]).reshape(1, 1).astype(jnp.float32)
    return w, br


def _kb_len_mask(kb_lengths, S_real, Sp):
    """[B, Sp] additive f32 mask from per-example valid-slot counts,
    folding the static Sp/S_real padding (GQA kb_lengths).  Clamped to
    >= 1: a zero-object image attends to slot 0 (a zero feature row),
    matching the XLA read unit (mac_cell.py)."""
    lim = jnp.clip(kb_lengths.astype(jnp.int32), 1, S_real)
    return jnp.where(jnp.arange(Sp)[None, :] < lim[:, None],
                     0.0, NEG_INF).astype(jnp.float32)


def _fwd_impl(statics, weights, kb, kbp, kbw1, controls, gates, mem0,
              mem_mask, seed, kb_lengths=None):
    (T, S_real, relu, use_gate, read_keep, kb_fresh, batch_tile,
     _) = statics
    B0 = kb.shape[0]
    if B0 % 8:                                  # ragged (mesh-shard) batch
        Bp = _round_up(B0, 8)
        final, hist = _fwd_impl(
            statics, weights, _pad_b(kb, Bp), _pad_b(kbp, Bp),
            _pad_b(kbw1, Bp), _pad_b(controls, Bp, 1),
            _pad_b(gates, Bp, 1), _pad_b(mem0, Bp), _pad_b(mem_mask, Bp),
            seed, _pad_b(kb_lengths, Bp))
        return final[:B0], hist[:, :B0]
    B, S, d, Bt, Sp, interpret = _layout(statics, kb)
    dtype = kb.dtype
    kb_p = _pad_s(kb, Sp)
    windowed = read_keep < 1.0 and not kb_fresh
    read_scale = 1.0 / read_keep if read_keep < 1.0 else 1.0
    w, br = _prep_weights(weights, dtype, d, kb_fresh,
                          read_scale=read_scale)
    tile, step_tile, full, smem = _specs(T, Bt, Sp, d)
    with_kb_mask = kb_lengths is not None
    kernel = _build_train_fwd_kernel(T, relu, S_real, use_gate, read_keep,
                                     kb_fresh, with_kb_mask=with_kb_mask)

    in_specs = [smem(), tile(Bt, Sp, d)]
    inputs = [seed.reshape(1).astype(jnp.int32), kb_p]
    if with_kb_mask:
        in_specs.append(tile(Bt, Sp))
        inputs.append(_kb_len_mask(kb_lengths, S_real, Sp))
    if not kb_fresh:
        in_specs += [tile(Bt, Sp, d), tile(Bt, Sp, d)]
        inputs += [_pad_s(kbp, Sp), _pad_s(kbw1, Sp)]
    in_specs.append(step_tile(T, Bt, d))
    inputs.append(controls.astype(dtype))
    if use_gate:
        in_specs.append(step_tile(T, Bt, d))
        inputs.append(gates.astype(dtype))
    in_specs += [tile(Bt, d), tile(Bt, d)]
    inputs += [mem0.astype(dtype), mem_mask.astype(dtype)]
    for key in ("wy", "by", "w1a", "w2", "b2"):
        in_specs.append(full())
        inputs.append(w[key])
    if kb_fresh:
        for key in _PX_KEYS:
            in_specs.append(full())
            inputs.append(w[key])
    in_specs += [full(), smem(), full(), full()]
    inputs += [w["wr128"], br, w["w3"], w["b3"]]

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)
    final, hist = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, d), dtype),
                   jax.ShapeDtypeStruct((T, B, d), dtype)],
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=[tile(Bt, d), step_tile(T, Bt, d)],
        scratch_shapes=([pltpu.VMEM((Bt, Sp, d), jnp.int32)]
                        if windowed else []),
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=T * B * Sp * d * d * 2 * (4 if kb_fresh else 2),
            bytes_accessed=B * Sp * d * 2 * (1 if kb_fresh else 3),
            transcendentals=T * B * Sp),
    )(*inputs)
    return final, hist


def _bwd_impl(statics, weights, kb, kbp, kbw1, controls, gates, mem0,
              mem_mask, seed, hist, g_final, kb_lengths=None):
    (T, S_real, relu, use_gate, read_keep, kb_fresh, batch_tile,
     _) = statics
    B0 = kb.shape[0]
    if B0 % 8:                                  # ragged (mesh-shard) batch
        Bp = _round_up(B0, 8)
        out = _bwd_impl(
            statics, weights, _pad_b(kb, Bp), _pad_b(kbp, Bp),
            _pad_b(kbw1, Bp), _pad_b(controls, Bp, 1),
            _pad_b(gates, Bp, 1), _pad_b(mem0, Bp), _pad_b(mem_mask, Bp),
            seed, _pad_b(hist, Bp, 1), _pad_b(g_final, Bp),
            _pad_b(kb_lengths, Bp))
        (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
         g_mask) = out
        slc = lambda x, ax=0: None if x is None else (
            x[:B0] if ax == 0 else x[:, :B0])
        return (g_weights, slc(g_kb), slc(g_kbp), slc(g_kbw1),
                slc(g_controls, 1), slc(g_gates, 1), slc(g_mem0),
                slc(g_mask))
    B, S, d, Bt, Sp, interpret = _layout(statics, kb, bwd=True)
    dtype = kb.dtype
    kb_p = _pad_s(kb, Sp)
    windowed = read_keep < 1.0 and not kb_fresh
    read_scale = 1.0 / read_keep if read_keep < 1.0 else 1.0
    w, br = _prep_weights(weights, dtype, d, kb_fresh,
                          read_scale=read_scale)
    tile, step_tile, full, smem = _specs(T, Bt, Sp, d)
    with_kb_mask = kb_lengths is not None
    kernel = _build_train_bwd_kernel(T, relu, S_real, use_gate, read_keep,
                                     kb_fresh, with_kb_mask=with_kb_mask)

    in_specs = [smem(), tile(Bt, Sp, d)]
    inputs = [seed.reshape(1).astype(jnp.int32), kb_p]
    if with_kb_mask:
        in_specs.append(tile(Bt, Sp))
        inputs.append(_kb_len_mask(kb_lengths, S_real, Sp))
    if not kb_fresh:
        in_specs += [tile(Bt, Sp, d), tile(Bt, Sp, d)]
        inputs += [_pad_s(kbp, Sp), _pad_s(kbw1, Sp)]
    in_specs.append(step_tile(T, Bt, d))
    inputs.append(controls.astype(dtype))
    if use_gate:
        in_specs.append(step_tile(T, Bt, d))
        inputs.append(gates.astype(dtype))
    in_specs.append(tile(Bt, d))
    inputs.append(mem_mask.astype(dtype))
    for key in ("wy", "by", "w1a", "w2", "b2"):
        in_specs.append(full())
        inputs.append(w[key])
    if kb_fresh:
        for key in _PX_KEYS:
            in_specs.append(full())
            inputs.append(w[key])
    in_specs += [full(), smem(), full(), full()]
    inputs += [w["wr128"], br, w["w3"], w["b3"]]
    in_specs.append(full())
    inputs.append((jnp.asarray(weights["wr"]).astype(jnp.float32)
                   * read_scale).reshape(1, d))
    in_specs += [step_tile(T, Bt, d), tile(Bt, d)]
    inputs += [hist, g_final.astype(dtype)]

    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct((B, Sp, d), dtype)]     # g_kb
    out_specs = [tile(Bt, Sp, d)]
    if not kb_fresh:
        out_shape += [
            jax.ShapeDtypeStruct((B, Sp, d), dtype),      # g_kbp
            jax.ShapeDtypeStruct((B, Sp, d), dtype),      # g_kbw1
        ]
        out_specs += [tile(Bt, Sp, d), tile(Bt, Sp, d)]
    out_shape.append(jax.ShapeDtypeStruct((T, B, d), dtype))  # g_controls
    out_specs.append(step_tile(T, Bt, d))
    if use_gate:
        out_shape.append(jax.ShapeDtypeStruct((T, B, d), dtype))
        out_specs.append(step_tile(T, Bt, d))
    out_shape += [
        jax.ShapeDtypeStruct((B, d), dtype),          # g_mem0
        jax.ShapeDtypeStruct((B, d), dtype),          # g_mask
        jax.ShapeDtypeStruct((d, d), f32),            # g_wy
        jax.ShapeDtypeStruct((1, d), f32),            # g_by
        jax.ShapeDtypeStruct((d, d), f32),            # g_w1a
        jax.ShapeDtypeStruct((d, d), f32),            # g_w2
        jax.ShapeDtypeStruct((1, d), f32),            # g_b2
    ]
    out_specs += [tile(Bt, d), tile(Bt, d)] + [full()] * 5
    if kb_fresh:
        out_shape += [
            jax.ShapeDtypeStruct((d, d), f32),        # g_wpx
            jax.ShapeDtypeStruct((1, d), f32),        # g_bpx
            jax.ShapeDtypeStruct((d, d), f32),        # g_w1b
            jax.ShapeDtypeStruct((1, d), f32),        # g_b1
        ]
        out_specs += [full()] * 4
    out_shape += [
        jax.ShapeDtypeStruct((1, d), f32),            # g_wr
        jax.ShapeDtypeStruct((1, 1), f32),            # g_br
        jax.ShapeDtypeStruct((2 * d, d), f32),        # g_w3
        jax.ShapeDtypeStruct((1, d), f32),            # g_b3
    ]
    out_specs += [full()] * 4

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=([pltpu.VMEM((Bt, Sp, d), jnp.int32)]
                        if windowed else []),
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=T * B * Sp * d * d * 2 * (13 if kb_fresh else 7),
            bytes_accessed=B * Sp * d * 2 * (2 if kb_fresh else 6),
            transcendentals=T * B * Sp),
    )(*inputs)

    it = iter(outs)
    g_kb = next(it)
    g_kbp = g_kbw1 = None
    if not kb_fresh:
        g_kbp, g_kbw1 = next(it), next(it)
    g_controls = next(it)
    g_gates = next(it) if use_gate else None
    g_mem0, g_mask = next(it), next(it)
    gw = {k: next(it) for k in ("wy", "by", "w1a", "w2", "b2")}
    if kb_fresh:
        gw.update({k: next(it) for k in _PX_KEYS})
    gw["wr"] = next(it)
    gw["br"] = next(it).reshape(())
    gw["w3"], gw["b3"] = next(it), next(it)
    for k in ("by", "b2", "wr", "b3") + (("bpx", "b1") if kb_fresh else ()):
        gw[k] = gw[k].reshape(-1)
    g_weights = {k: gw[k].astype(jnp.asarray(weights[k]).dtype)
                 for k in _W_KEYS + (_PX_KEYS if kb_fresh else ())}
    g_weights["br"] = g_weights["br"].reshape(
        jnp.asarray(weights["br"]).shape)
    sl = lambda x: x[:, :S] if Sp != S else x
    return (g_weights, sl(g_kb),
            None if kb_fresh else sl(g_kbp),
            None if kb_fresh else sl(g_kbw1), g_controls,
            g_gates, g_mem0, g_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mac_train_recurrence(statics, weights, kb, kbp, kbw1, controls, gates,
                         mem0, mem_mask, seed, kb_lengths=None):
    """Differentiable fused MAC memory chain.

    statics: (T, S_real, relu, use_gate, read_keep, kb_fresh, batch_tile,
    interpret).  weights: dict over {wy, by, w1a, w2, b2, wr, br, w3, b3}
    plus {wpx, bpx, w1b, b1} in kb_fresh mode (param-tree dtypes);
    kb [B, S, d]; kbp/kbw1 [B, S, d] hoisted projections (None in
    kb_fresh mode — the kernel projects per step from a fresh per-step
    KB dropout mask); controls/gates [T, B, d]; mem0 / mem_mask [B, d];
    seed int32 scalar array (RNG stream for the in-kernel dropout
    masks); kb_lengths optional [B] int32 per-example valid KB-slot
    counts (GQA) — masked slots get zero read attention (fwd) and zero
    per-slot gradients (bwd, automatic: every per-slot cotangent in the
    recomputed chain is a multiple of the masked attention).
    Returns the final memory [B, d].
    """
    final, _ = _fwd_impl(statics, weights, kb, kbp, kbw1, controls, gates,
                         mem0, mem_mask, seed, kb_lengths)
    return final


def _vjp_fwd(statics, weights, kb, kbp, kbw1, controls, gates, mem0,
             mem_mask, seed, kb_lengths=None):
    final, hist = _fwd_impl(statics, weights, kb, kbp, kbw1, controls,
                            gates, mem0, mem_mask, seed, kb_lengths)
    return final, (weights, kb, kbp, kbw1, controls, gates, mem0,
                   mem_mask, seed, hist, kb_lengths)


def _vjp_bwd(statics, res, g_final):
    (weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask, seed,
     hist, kb_lengths) = res
    (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
     g_mask) = _bwd_impl(statics, weights, kb, kbp, kbw1, controls, gates,
                         mem0, mem_mask, seed, hist, g_final, kb_lengths)
    g_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    g_kbl = (None if kb_lengths is None else
             np.zeros(np.shape(kb_lengths), dtype=jax.dtypes.float0))
    return (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
            g_mask, g_seed, g_kbl)


mac_train_recurrence.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------- mesh-sharded variant

def _rec_in_specs(data_axis):
    """shard_map in_specs for (weights, kb, kbp, kbw1, controls, gates,
    mem0, mem_mask, seed, kb_lengths)."""
    from jax.sharding import PartitionSpec as P
    b0 = P(data_axis)
    b1 = P(None, data_axis)
    return (P(), b0, b0, b0, b1, b1, b0, b0, P(), b0)


def _local_seed(seed, data_axis):
    """Per-shard RNG stream: folding the data-axis index into the seed
    decorrelates the in-kernel dropout masks across shards (the kernels'
    flat-index keying restarts at 0 on every shard).  Applied identically
    in fwd and bwd, so masks still replay exactly.  int32 wrap-around is
    well-defined in XLA."""
    ax = jax.lax.axis_index(data_axis).astype(jnp.int32)
    return seed + ax * jnp.int32(1000003)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def mac_train_recurrence_mesh(statics, mesh, data_axis, weights, kb, kbp,
                              kbw1, controls, gates, mem0, mem_mask, seed,
                              kb_lengths=None):
    """``mac_train_recurrence`` partitioned over a device mesh's
    ``data_axis`` with shard_map: each device runs the fwd/bwd kernels on
    its batch shard; the ONLY collective is one psum of the (tiny,
    weight-shaped) gradient accumulators in the backward.  No KB-sized
    operand is ever gathered — the custom call partitions like the rest
    of the SPMD program (the working completion of the reference's tower
    DP, model.py:671-679, at kernel granularity)."""
    final, _ = _mesh_fwd_impl(statics, mesh, data_axis, weights, kb, kbp,
                              kbw1, controls, gates, mem0, mem_mask, seed,
                              kb_lengths)
    return final


def _mesh_fwd_impl(statics, mesh, data_axis, weights, kb, kbp, kbw1,
                   controls, gates, mem0, mem_mask, seed, kb_lengths):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    n = mesh.shape[data_axis]
    assert kb.shape[0] % n == 0, (kb.shape, n)

    def inner(weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask,
              seed, kb_lengths):
        return _fwd_impl(statics, weights, kb, kbp, kbw1, controls, gates,
                         mem0, mem_mask, _local_seed(seed, data_axis),
                         kb_lengths)

    return shard_map(
        inner, mesh=mesh, in_specs=_rec_in_specs(data_axis),
        out_specs=(P(data_axis), P(None, data_axis)), check_vma=False)(
        weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask, seed,
        kb_lengths)


def _mesh_vjp_fwd(statics, mesh, data_axis, weights, kb, kbp, kbw1,
                  controls, gates, mem0, mem_mask, seed, kb_lengths=None):
    final, hist = _mesh_fwd_impl(statics, mesh, data_axis, weights, kb,
                                 kbp, kbw1, controls, gates, mem0,
                                 mem_mask, seed, kb_lengths)
    return final, (weights, kb, kbp, kbw1, controls, gates, mem0,
                   mem_mask, seed, hist, kb_lengths)


def _mesh_vjp_bwd(statics, mesh, data_axis, res, g_final):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    (weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask, seed,
     hist, kb_lengths) = res

    def inner(weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask,
              seed, hist, g_final, kb_lengths):
        (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
         g_mask) = _bwd_impl(statics, weights, kb, kbp, kbw1, controls,
                             gates, mem0, mem_mask,
                             _local_seed(seed, data_axis), hist, g_final,
                             kb_lengths)
        # the ONE collective: weight grads are partial sums per shard
        g_weights = jax.lax.psum(g_weights, data_axis)
        return (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates,
                g_mem0, g_mask)

    b0, b1 = P(data_axis), P(None, data_axis)
    in_specs = (P(), b0, b0, b0, b1, b1, b0, b0, P(), b1, b0, b0)
    out = shard_map(
        inner, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), b0, b0, b0, b1, b1, b0, b0),
        check_vma=False)(
        weights, kb, kbp, kbw1, controls, gates, mem0, mem_mask, seed,
        hist, g_final, kb_lengths)
    (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
     g_mask) = out
    g_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    g_kbl = (None if kb_lengths is None else
             np.zeros(np.shape(kb_lengths), dtype=jax.dtypes.float0))
    return (g_weights, g_kb, g_kbp, g_kbw1, g_controls, g_gates, g_mem0,
            g_mask, g_seed, g_kbl)


mac_train_recurrence_mesh.defvjp(_mesh_vjp_fwd, _mesh_vjp_bwd)


# ------------------------------------------------------------------ engine

class FusedTrainEngine:
    """Training forward with the fused recurrence: Flax modules for the
    encoder / stem / output head (their dropouts and backward are cheap
    and stay in XLA), glue einsums for the loop-independent control unit
    and write gate, and the custom-VJP kernel pair for the memory chain.

    Exposes ``apply(variables, qs, lengths, images, train=True,
    rngs={"dropout": key})`` returning (logits, {}), the same contract as
    ``MACNetwork.apply`` — so ``train.make_train_step(engine, cfg, tx)``
    builds the fused training step with the identical loss/optimizer
    plumbing (steps.py).
    """

    def __init__(self, cfg: Config, embedding_init, batch_tile: int = 16,
                 force_fresh_kb: bool = False, mesh=None,
                 data_axis: str = "data"):
        from mac_network_tpu.models.mac_network import (
            QuestionEncoder, Stem, OutputUnit, Classifier)
        assert supports_fused_train(cfg), \
            "config outside the fused-train envelope; use the XLA path"
        self.cfg = cfg
        self.batch_tile = batch_tile
        # a Mesh partitions the fwd/bwd kernels over its data axis via
        # shard_map (mac_train_recurrence_mesh); the XLA glue and the
        # loss/optimizer stay GSPMD-partitioned
        self.mesh = mesh
        self.data_axis = data_axis
        # fresh-KB mode is chosen automatically from the config (fresh
        # per-step masks whenever read dropout is active and untied);
        # force_fresh_kb additionally routes the no-dropout case through
        # the in-kernel projections (used by tests to check that path's
        # gradients against XLA exactly)
        self.force_fresh_kb = force_fresh_kb
        self.embedding_init = embedding_init
        self.encoder = QuestionEncoder(cfg, embedding_init)
        self.stem = Stem(cfg)
        self.output = OutputUnit(cfg)
        self.classifier = Classifier(cfg)

    def apply(self, variables, question_ids, lengths, images,
              train: bool = True, rngs=None, interpret=None,
              kb_lengths=None):
        from mac_network_tpu.ops.pallas.mac_fused import (
            extract_mac_weights, _apply_linear)
        from mac_network_tpu.ops.dropout import generate_var_dp_mask

        cfg = self.cfg
        params = variables["params"]
        dtype = (jnp.bfloat16 if cfg.computeDtype == "bfloat16"
                 else jnp.float32)
        images = images.astype(dtype)
        T = cfg.netLength
        d = cfg.memDim
        key = (rngs or {}).get("dropout", jax.random.key(0))
        k_enc, k_stem, k_out, k_kb, k_mem, k_seed = jax.random.split(key, 6)

        words_emb, cntx, vec_q, a_emb = self.encoder.apply(
            {"params": params["qEmbeddings"]}, question_ids, lengths,
            train=train, rngs={"dropout": k_enc})
        kb = self.stem.apply({"params": params["stem"]}, images,
                             train=train, rngs={"dropout": k_stem})
        B = vec_q.shape[0]
        mac = params["mac"]
        weights = extract_mac_weights(cfg, params)

        # ---- loop-independent control unit (serving-engine glue,
        # reference mac_cell.py:133-187 without the feedPrev merge)
        shared = _apply_linear(vec_q, mac["qInput"])
        if cfg.controlInputAct == "TANH":
            shared = jnp.tanh(shared)
        elif cfg.controlInputAct == "RELU":
            shared = _act(shared, cfg.relu)
        cis = []
        for i in range(T):
            k = f"qInput{i}" if cfg.controlInputUnshared else "qInputU"
            cis.append(_apply_linear(shared, mac[k]))
        ci = jnp.stack(cis, axis=0)
        words = cntx if cfg.controlContextual else words_emb
        L = words.shape[1]
        wmask = jnp.where(jnp.arange(L)[None, :] < lengths[:, None],
                          0.0, NEG_INF).astype(jnp.float32)
        wq = weights["wq"].astype(dtype)
        qlog = jnp.einsum("tbd,bld->tbl", ci * wq[None, None, :], words,
                          preferred_element_type=jnp.float32)
        qlog = qlog + weights["bq"].astype(jnp.float32) + wmask[None]
        qatt = jax.nn.softmax(qlog, axis=-1).astype(dtype)
        controls = jnp.einsum("tbl,bld->tbd", qatt, words,
                              preferred_element_type=jnp.float32
                              ).astype(dtype)

        gates = None
        if cfg.writeGate:
            gw = weights["wg"].astype(dtype)
            gb = weights["bg"].astype(jnp.float32)
            glog = jnp.dot(controls, gw, preferred_element_type=jnp.float32)
            z = jax.nn.sigmoid(glog + gb + cfg.writeGateBias)
            gates = jnp.broadcast_to(z.astype(dtype), (T, B, d))

        # ---- KB projections: hoisted when the KB dropout mask is
        # step-tied (--readVariationalDropout; mac_network.py hoist path)
        # or inactive; in-kernel per step (kb_fresh) at the reference's
        # fresh per-step-mask semantics (mac_cell.py:257-260)
        kb_fresh = self.force_fresh_kb or (
            train and cfg.readDropout < 1.0
            and not cfg.readVariationalDropout)
        if kb_fresh:
            kbp = kbw1 = None
        else:
            kb_in = kb
            if train and cfg.readVariationalDropout and cfg.readDropout < 1.0:
                kb_mask = generate_var_dp_mask(k_kb, kb.shape,
                                               cfg.readDropout)
                kb_in = (kb / cfg.readDropout) * kb_mask.astype(kb.dtype)
            kbp = _apply_linear(kb_in, {"weight": weights["wpx"],
                                        "bias": weights["bpx"]})
            kbw1 = _apply_linear(kbp, {"weight": weights["w1b"],
                                       "bias": weights["b1"]})

        # ---- variational memory dropout mask, pre-scaled (ones at eval)
        if train and cfg.memoryVariationalDropout and cfg.memoryDropout < 1.0:
            m_mask = generate_var_dp_mask(
                k_mem, (B, d), cfg.memoryDropout) / cfg.memoryDropout
        else:
            m_mask = jnp.ones((B, d), jnp.float32)

        def init_state(kind, prm_key, dim):
            if kind == "PRM":
                return jnp.broadcast_to(
                    mac[prm_key].astype(dtype)[None], (B, dim))
            if kind == "ZERO":
                return jnp.zeros((B, dim), dtype)
            return vec_q
        mem0 = init_state(cfg.initMem, "initMem", cfg.memDim)

        read_keep = float(cfg.readDropout) if train else 1.0
        statics = (T, kb.shape[1], cfg.relu, bool(cfg.writeGate),
                   read_keep, kb_fresh, self.batch_tile,
                   interpret)
        kernel_weights = {
            "wy": weights["wmem"], "by": weights["bmem"],
            "w1a": weights["w1a"], "w2": weights["w2"], "b2": weights["b2"],
            "wr": weights["wr"], "br": weights["br"],
            "w3": weights["w3"], "b3": weights["b3"]}
        if kb_fresh:
            kernel_weights.update(
                wpx=weights["wpx"], bpx=weights["bpx"],
                w1b=weights["w1b"], b1=weights["b1"])
        seed = jax.random.randint(k_seed, (), 0, np.int32(2 ** 31 - 1),
                                  dtype=jnp.int32)
        if (self.mesh is not None
                and self.mesh.shape.get(self.data_axis, 1) > 1):
            final_memory = mac_train_recurrence_mesh(
                statics, self.mesh, self.data_axis, kernel_weights, kb,
                kbp, kbw1, controls, gates, mem0, m_mask.astype(dtype),
                seed, kb_lengths)
        else:
            final_memory = mac_train_recurrence(
                statics, kernel_weights, kb, kbp, kbw1, controls, gates,
                mem0, m_mask.astype(dtype), seed, kb_lengths)

        features = self.output.apply(
            {"params": params["output"]}, final_memory, vec_q, images,
            train=train, rngs={"dropout": k_out})
        logits = self.classifier.apply(
            {"params": params["classifier"]}, features, a_emb,
            train=train, rngs={"dropout": k_out})
        return logits, {}
