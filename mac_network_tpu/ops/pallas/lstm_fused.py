"""Fused Pallas bi-LSTM question encoder (inference).

The encoder (reference: model.py:279-307 via ops.RNNLayer/biRNNLayer,
ops.py:859-911) is a short bidirectional LSTM over <=~45 question words.
Under XLA it runs as 2L sequential scan steps of small matmuls and
measures ~2.1 ms at B=512 — latency-bound, not FLOP-bound.  This kernel
keeps both directions' recurrent weights resident in VMEM and runs the
two (independent) chains interleaved inside one loop:

  * the input half of the gate projections (x @ Wx + b for every time
    step, both directions) is precomputed OUTSIDE the kernel as two
    batched MXU matmuls at full utilization — exactly the hoist
    ops/rnn.py applies to the XLA path, so the kernel body is only the
    sequential h @ Wh half (K = h = encDim/2);
  * TF ``dynamic_rnn`` masking semantics are preserved: past each row's
    length the state freezes and outputs are zero
    (ops/rnn._MaskedStep); the backward direction consumes
    ``reverse_sequence``-reversed inputs and its outputs are re-reversed
    by the caller, matching tf.reverse_sequence behavior.

Gate math matches ops/rnn.LSTMCell (TF BasicLSTMCell: i,j,f,o gate
order, forget bias 1.0 pre-sigmoid, tanh state activation) and reads the
same ``kernel_w``/``kernel_b`` parameters, so any checkpoint drives both
paths.  Eval only (the engine path): dropouts are inactive.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mac_network_tpu.config import Config
from mac_network_tpu.ops.rnn import reverse_sequence


def supports_fused_encoder(cfg: Config) -> bool:
    """Single bi-LSTM layer with an even per-direction hidden size that
    tiles the TPU lane dim."""
    return (cfg.encType == "LSTM" and cfg.encBi and cfg.encNumLayers == 1
            and cfg.encDim % 2 == 0 and (cfg.encDim // 2) % 128 == 0)


def _lstm_gates(z, c, h, v, dtype):
    """One BasicLSTMCell update + dynamic_rnn masking — all in f32
    (sigmoid/tanh on bf16 vectors lower to a mistyped vector.broadcast on
    this Mosaic toolchain, and the matmul accumulates f32 anyway).
    z: [Bt, 4h] f32 pre-activations; c/h: [Bt, h] f32 carries; v: [Bt, h]
    f32 validity (1.0 inside the sequence, 0.0 past its length —
    full-width so no lane-broadcast of a dynamically-sliced column)."""
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    new_c = v * new_c + (1.0 - v) * c
    out = v * new_h                       # zero past the length
    new_h = v * new_h + (1.0 - v) * h
    return new_c, new_h, out.astype(dtype)


def _build_kernel(L: int):
    def kernel(xzf_ref, xzb_ref, vmask_ref, whf_ref, whb_ref,
               outf_ref, outb_ref, hf_ref, hb_ref):
        # time-major refs ([L, Bt, ...]) so the per-step dynamic slice is
        # on the LEADING axis (Mosaic requires sublane-dim indices to be
        # static multiples of 8)
        Bt = xzf_ref.shape[1]
        G = xzf_ref.shape[2]
        h = G // 4
        dtype = xzf_ref.dtype
        whf = whf_ref[...]
        whb = whb_ref[...]
        zero = jnp.zeros((Bt, h), jnp.float32)

        def step(t, carry):
            cf, hf, cb, hb = carry                        # f32 carries
            v = vmask_ref[t].astype(jnp.float32)          # [Bt, h]
            # the two directions are independent — interleave their
            # matmul + gate chains so the scheduler can overlap them
            zf = (jnp.dot(hf.astype(dtype), whf,
                          preferred_element_type=jnp.float32)
                  + xzf_ref[t].astype(jnp.float32))
            zb = (jnp.dot(hb.astype(dtype), whb,
                          preferred_element_type=jnp.float32)
                  + xzb_ref[t].astype(jnp.float32))
            cf, hf, out_f = _lstm_gates(zf, cf, hf, v, dtype)
            cb, hb, out_b = _lstm_gates(zb, cb, hb, v, dtype)
            outf_ref[pl.ds(t, 1)] = out_f[None]
            outb_ref[pl.ds(t, 1)] = out_b[None]
            return cf, hf, cb, hb

        _, hf, _, hb = jax.lax.fori_loop(
            0, L, step, (zero, zero, zero, zero))
        hf_ref[...] = hf.astype(dtype)
        hb_ref[...] = hb.astype(dtype)

    return kernel


def fused_bilstm(cfg: Config, rnn_params: Dict[str, Any], words, lengths,
                 batch_tile: Optional[int] = None,
                 interpret: Optional[bool] = None,
                 mesh=None, data_axis: str = "data"
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the bi-LSTM encoder layer.  words: [B, L, D] (compute dtype);
    lengths: [B] int.  Returns (cntx [B, L, 2h], vec [B, 2h]) exactly as
    ops/rnn.RNNLayer would (fw/bw concat; reference ops.py:859-911).
    ``mesh`` partitions the kernel over its ``data_axis`` with shard_map
    (each device runs its batch shard; no collectives)."""
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        n = mesh.shape[data_axis]
        assert words.shape[0] % n == 0, (words.shape, n)
        return shard_map(
            lambda p, w, l: fused_bilstm(cfg, p, w, l,
                                         batch_tile=batch_tile,
                                         interpret=interpret),
            mesh=mesh, in_specs=(P(), P(data_axis), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis)),
            check_vma=False)(rnn_params, words, lengths)
    B, L, D = words.shape
    dtype = words.dtype
    h = cfg.encDim // 2
    fw = rnn_params["fw"]["scan"]["cell"]
    bw = rnn_params["bw"]["scan"]["cell"]

    def xz(cell, x):
        w = cell["kernel_w"].astype(dtype)
        b = cell["kernel_b"].astype(dtype)
        return (jnp.dot(x, w[:D], preferred_element_type=jnp.float32)
                .astype(dtype) + b)

    # time-major xz: [L, B, 4h] (leading-axis dynamic slices in-kernel)
    xz_f = jnp.transpose(xz(fw, words), (1, 0, 2))
    words_rev = reverse_sequence(words, lengths)
    xz_b = jnp.transpose(xz(bw, words_rev), (1, 0, 2))
    # validity mask pre-expanded to [L, B, h]: the kernel then only ever
    # slices it like the xz inputs (scalar-vs-vector compares inside the
    # kernel trip a Mosaic broadcast-type bug on this toolchain)
    vmask = jnp.broadcast_to(
        (jnp.arange(L)[:, None] < lengths[None, :]).astype(dtype)
        [:, :, None], (L, B, h))

    if batch_tile is None:
        # one tile if it fits: a single grid cell measures faster than a
        # serialized grid (1.62 vs 2.02 ms at B=512/L=24); the resident
        # set per tile is the two xz tensors + mask + outputs
        bytes_per_row = L * (4 * h * 2 * 2 + h * 2 * 3) + h * 2 * 2
        batch_tile = B
        while batch_tile > 8 and batch_tile * bytes_per_row > 80 * 2**20:
            batch_tile //= 2
    Bt = batch_tile
    while B % Bt:
        Bt //= 2
    Bt = max(Bt, 8) if B % 8 == 0 else B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    tmaj = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0, i) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)

    out_f, out_b, h_f, h_b = pl.pallas_call(
        _build_kernel(L),
        out_shape=(jax.ShapeDtypeStruct((L, B, h), dtype),
                   jax.ShapeDtypeStruct((L, B, h), dtype),
                   jax.ShapeDtypeStruct((B, h), dtype),
                   jax.ShapeDtypeStruct((B, h), dtype)),
        grid=(B // Bt,),
        in_specs=[tmaj(L, Bt, 4 * h), tmaj(L, Bt, 4 * h), tmaj(L, Bt, h),
                  full(), full()],
        out_specs=(tmaj(L, Bt, h), tmaj(L, Bt, h), tile(Bt, h),
                   tile(Bt, h)),
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * h * 4 * h * 2,
            bytes_accessed=B * L * 8 * h * 2,
            transcendentals=B * L * 8 * h),
    )(xz_f, xz_b, vmask,
      fw["kernel_w"][D:].astype(dtype), bw["kernel_w"][D:].astype(dtype))

    out_f = jnp.transpose(out_f, (1, 0, 2))
    out_b = reverse_sequence(jnp.transpose(out_b, (1, 0, 2)), lengths)
    cntx = jnp.concatenate([out_f, out_b], axis=-1)
    vec = jnp.concatenate([h_f, h_b], axis=-1)
    return cntx, vec
