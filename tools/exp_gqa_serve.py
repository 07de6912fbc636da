"""Batch-tile sweep for the fused serving engine at the GQA operating
point (100 objects x 2048-dim detector features, BASELINE configs[4]).

Round-4 found the fused serve kernel LOSES to XLA at this shape
(39.3k vs 45.0k qps) while winning at CLEVR's 196x512; the engine
probe now routes auto users to XLA there, but the kernel itself was
tuned (batch_tile=16, VMEM budget) for S=196 d=512.  This sweep
measures whether a different batch tile flips the ranking at
S=100/d=2048, where the per-tile weight residency (five d x d
matrices ~42 MB at d=2048) dominates VMEM instead of the KB tile.

Usage (on the real TPU):
    python tools/exp_gqa_serve.py                  # sweep tiles at GQA shape
    python tools/exp_gqa_serve.py --B 512          # other batch
    python tools/exp_gqa_serve.py --S 196 --d 512  # sanity: CLEVR shape
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, fence, n_iter=20, trials=3):
    fence(fn())
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
    ap.add_argument("--S", type=int, default=100)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--tiles", default="8,16,32,64")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg, _make_model_and_inputs
    from mac_network_tpu.config import load_dataset_config
    from mac_network_tpu.ops.pallas import (FusedMACEngine,
                                            supports_fused_config)

    cfg = _flagship_cfg(small=False)
    if args.S == 100 and args.d == 2048:
        cfg = dataclasses.replace(cfg, dataset="GQA")
        load_dataset_config(cfg)
    B = args.B
    model, variables, (qs, lens, imgs) = _make_model_and_inputs(cfg, B)
    rng = np.random.RandomState(11)
    kbl = None
    if cfg.dataset == "GQA":
        kbl = jnp.asarray(rng.randint(1, cfg.gqaObjectsNum + 1, (B,)),
                          jnp.int32)
    fence = lambda x: np.asarray(jax.tree_util.tree_leaves(x)[0])

    @jax.jit
    def xfwd(v, q, l, im, k):
        logits, _ = model.apply(v, q, l, im, train=False, kb_lengths=k)
        return logits.argmax(-1)

    dt = _timed(lambda: xfwd(variables, qs, lens, imgs, kbl), fence)
    print(f"xla           : {dt*1e3:8.3f} ms  {B/dt:10.1f} qps", flush=True)

    assert supports_fused_config(cfg)
    for tile in (int(t) for t in args.tiles.split(",")):
        eng = FusedMACEngine(cfg, model.embedding_init, batch_tile=tile)
        pf = jax.jit(lambda v, q, l, im, k, e=eng: jnp.argmax(
            e(v, q, l, im, kb_lengths=k), -1))
        try:
            dt = _timed(lambda: pf(variables, qs, lens, imgs, kbl), fence)
            print(f"pallas tile={tile:3d}: {dt*1e3:8.3f} ms  "
                  f"{B/dt:10.1f} qps", flush=True)
        except Exception as e:
            print(f"pallas tile={tile:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
