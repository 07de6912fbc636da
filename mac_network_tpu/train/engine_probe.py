"""One-shot --fusedTrain micro-probe: pick the faster training engine.

serve.py's ``resolve_engine`` already self-calibrates the SERVING path,
but ``--fusedTrain`` used to select the fused Pallas training recurrence
unconditionally — and at some operating points the fused pair loses to
plain XLA (GQA's 100x2048 KB: fused 6,837 vs XLA 7,168 ex/s on v5e), so
a forced flag could silently cost throughput for a whole training run.
``resolve_train_engine`` times ONE optimizer step through each engine at
the run's real batch shape and uses the winner; the decision is cached
per (device kind, batch, netLength, memDim, KB size, dtype) in
~/.cache/mac_tpu_xla/train_engine_cache.json so the probe — and the
loser's compile — is one-shot per platform+shape.

Scope: TPU + single-host only.  On CPU the interpret-mode kernels never
win (and tests rely on --fusedTrain forcing them), and under multi-host
every process must make the SAME choice (the engines differ in
collective layout), so both cases keep the explicit flag's engine.
``--fusedTrainProbe=false`` opts out entirely.

The reference has no analogue: its one hot loop is the TF1 session
(reference model.py:746); engine choice is a TPU-rebuild concern.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Callable, Optional

from mac_network_tpu.config import Config


def _cache_path() -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "mac_tpu_xla")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "train_engine_cache.json")


def _probe_key(cfg: Config, device_kind: str) -> str:
    H, W, C = cfg.imageDims
    return (f"{device_kind}|B{cfg.batchSize}|T{cfg.netLength}|d{cfg.memDim}"
            f"|S{H * W}|{cfg.computeDtype}|train")


def resolve_train_engine(cfg: Config, model, fused_factory: Callable[[], object],
                         timer: Optional[Callable[[object], float]] = None,
                         device_kind: str = "", cache_path: str = None):
    """Return the step model — ``model`` (XLA) or ``fused_factory()`` —
    that ``make_train_step`` should wrap when ``--fusedTrain`` is set.

    ``timer(step_model) -> seconds`` runs one warm optimizer step through
    a built train step (main.py passes a 1-warmup/3-rep micro-probe on a
    dummy batch; donation-safe because the timer threads the returned
    state).  Without a timer (CPU, multi-host, --no-fusedTrainProbe) the
    fused engine is used as before.
    """
    if timer is None or not getattr(cfg, "fusedTrainProbe", True):
        return fused_factory()
    path = cache_path or _cache_path()
    key = _probe_key(cfg, device_kind)
    try:
        with open(path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if key in cache:
        choice = cache[key]["engine"]
    else:
        t_fused = timer(fused_factory())
        t_xla = timer(model)
        choice = "fused" if t_fused < t_xla else "xla"
        cache[key] = {"engine": choice, "xla_s": t_xla, "fused_s": t_fused}
        try:
            with open(path, "w") as f:
                json.dump(cache, f, indent=1)
        except OSError:
            pass
        print(f"train: probe {key}: xla {t_xla * 1e3:.1f} ms/step, fused "
              f"{t_fused * 1e3:.1f} ms/step -> {choice}", file=sys.stderr)
    return fused_factory() if choice == "fused" else model


def make_step_timer(cfg: Config, tx, variables, device_put, rng,
                    warmup: int = 1, reps: int = 3):
    """Build ``timer(step_model) -> seconds/step`` for the probe: a dummy
    batch at the run's exact shapes, one compile+warmup step, then the
    best of ``reps`` timed steps (best-of defends against one-off link
    hiccups the same way bench.py's timing windows do)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mac_network_tpu.train.state import create_train_state
    from mac_network_tpu.train.steps import make_train_step

    H, W, C = cfg.imageDims
    B = cfg.batchSize
    rs = np.random.RandomState(0)
    batch = {
        "questions": jnp.asarray(
            rs.randint(1, max(2, cfg.questionWordsNum), (B, 8)), jnp.int32),
        "questionLengths": jnp.full((B,), 8, jnp.int32),
        "images": jnp.asarray(rs.randn(B, H, W, C).astype(np.float32)),
        "answers": jnp.zeros((B,), jnp.int32),
        "mask": jnp.ones((B,), jnp.float32),
    }
    if cfg.dataset == "GQA":
        batch["imageObjectsNum"] = jnp.asarray(
            rs.randint(1, W + 1, (B,)), jnp.int32)
    batch = device_put(batch)
    host_params = jax.device_get(variables["params"])

    def timer(step_model) -> float:
        step = make_train_step(step_model, cfg, tx)
        st = create_train_state(
            cfg, {"params": jax.tree_util.tree_map(jnp.asarray,
                                                   host_params)}, tx)
        for _ in range(warmup):
            st, m = step(st, batch, float(cfg.lr), rng)
        jax.block_until_ready(m["loss"])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st, m = step(st, batch, float(cfg.lr), rng)
            jax.block_until_ready(m["loss"])
            best = min(best, time.perf_counter() - t0)
        return best

    return timer
