"""Benchmark: CLEVR inference throughput (questions/sec/chip) on the
flagship MAC model at netLength=16, bf16, against the driver's north-star
target of 5,000 q/s/chip (BASELINE.json:5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QPS = 5000.0


def main():
    import jax
    from __graft_entry__ import _flagship_cfg, _make_model_and_inputs

    cfg = _flagship_cfg(small=False)
    batch = 512   # throughput sweet spot on v5e (24.8k q/s vs 22.8k at 256)
    model, variables, (qs, lens, imgs) = _make_model_and_inputs(cfg, batch)

    @jax.jit
    def fwd(variables, qs, lens, imgs):
        logits, _ = model.apply(variables, qs, lens, imgs, train=False)
        return logits.argmax(-1)

    # compile + warmup; sync via host transfer — through the tunneled
    # backend block_until_ready returns before execution completes, so the
    # D2H copy of the last output is the only trustworthy fence (the device
    # stream executes in order, so it implies all prior batches finished)
    preds = np.asarray(fwd(variables, qs, lens, imgs))

    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        preds = fwd(variables, qs, lens, imgs)
    np.asarray(preds)
    dt = (time.perf_counter() - t0) / n_iter
    qps = batch / dt

    print(json.dumps({
        "metric": "clevr_inference_qps_netlength16",
        "value": round(qps, 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
