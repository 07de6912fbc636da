"""Microbench harness for the fused training kernel pair (mac_train.py).

Isolates the forward and backward Pallas kernels at the flagship tied
config (B=256, T=16, S=196, d=512, bf16, readDropout=0.85 tied,
variational memory dropout) so kernel-level levers can be measured in
seconds instead of through the full bench.py train step.  The numbers
this prints back the lever-by-lever table in ARCHITECTURE.md ("Attacking
the serialized-elementwise tax").

Usage (on the real TPU):
    python tools/exp_fused_train.py                 # tied flagship
    python tools/exp_fused_train.py --keep 1.0      # ablate mask draws
    python tools/exp_fused_train.py --relu NON      # ablate activations
    python tools/exp_fused_train.py --fresh         # fresh-KB (parity) mode
    python tools/exp_fused_train.py --tile 8        # fwd batch tile
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, fence, n_iter=20, trials=3):
    """Mean of ``n_iter`` back-to-back dispatches, best of ``trials``.
    The warmup fences through np.asarray — through this environment's
    tunneled backend a bare block_until_ready on a fresh executable can
    return early, which made kernels look 100x faster than they are."""
    fence(fn())  # compile + warmup with a HARD host-transfer fence
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--S", type=int, default=196)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--keep", type=float, default=0.85)
    ap.add_argument("--relu", default="ELU")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--gate", action="store_true")
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mac_network_tpu.ops.pallas.mac_train import (
        _fwd_impl, _bwd_impl, mac_train_recurrence)

    B, T, S, d = args.B, args.T, args.S, args.d
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, dtype)
    weights = dict(wy=r(d, d), by=r(d), w1a=r(d, d), w2=r(d, d), b2=r(d),
                   wr=r(d), br=jnp.asarray(0.1, dtype), w3=r(2 * d, d),
                   b3=r(d))
    if args.fresh:
        weights.update(wpx=r(d, d), bpx=r(d), w1b=r(d, d), b1=r(d))
    kb = r(B, S, d)
    kbp = None if args.fresh else r(B, S, d)
    kbw1 = None if args.fresh else r(B, S, d)
    controls = r(T, B, d)
    gates = r(T, B, d) if args.gate else None
    mem0 = r(B, d)
    mem_mask = jnp.ones((B, d), dtype)
    seed = jnp.asarray(1234, jnp.int32)
    statics = (T, S, args.relu, args.gate, args.keep, args.fresh,
               args.tile, None)

    first = lambda out: np.asarray(jax.tree_util.tree_leaves(out)[0])

    fwd = jax.jit(lambda *a: _fwd_impl(statics, *a))
    final, hist = fwd(weights, kb, kbp, kbw1, controls, gates, mem0,
                      mem_mask, seed)
    dt_f = _timed(lambda: fwd(weights, kb, kbp, kbw1, controls, gates,
                              mem0, mem_mask, seed), first, args.iters)

    g_final = r(B, d)
    bwd = jax.jit(lambda *a: _bwd_impl(statics, *a))
    dt_b = _timed(lambda: bwd(weights, kb, kbp, kbw1, controls, gates,
                              mem0, mem_mask, seed, hist, g_final),
                  first, args.iters)

    # full custom-VJP step (fwd + bwd through jax.grad), the number the
    # train step actually pays for the recurrence
    def loss(w, kb_, kbp_, kbw1_, ctrl_, mem0_):
        out = mac_train_recurrence(statics, w, kb_, kbp_, kbw1_, ctrl_,
                                   gates, mem0_, mem_mask, seed)
        return jnp.sum(out.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 4)))
    dt_g = _timed(lambda: grad(weights, kb, kbp, kbw1, controls, mem0),
                  first, args.iters)

    mode = "fresh" if args.fresh else "tied"
    print(f"# B={B} T={T} S={S} d={d} {args.dtype} keep={args.keep} "
          f"relu={args.relu} mode={mode} gate={args.gate} tile={args.tile}")
    print(f"fwd_kernel_ms  {dt_f * 1e3:8.3f}")
    print(f"bwd_kernel_ms  {dt_b * 1e3:8.3f}")
    print(f"fwd+bwd_ms     {dt_g * 1e3:8.3f}")


if __name__ == "__main__":
    main()
