"""Summarize a jax.profiler trace: device time per op and per module.

Usage:
    python tools/trace_summary.py /path/to/logdir [--steps N] [--top K]

``logdir`` is what you passed to ``jax.profiler.trace`` (or the per-epoch
trace directory written by ``--profile``).  Reads the Chrome-trace JSON
the TPU runtime emits (plugins/profile/.../*.trace.json.gz) — no
tensorboard required — and prints:

  * total attributed device op time (divided by --steps for ms/step),
  * the top-K HLO ops with their source line and tf_op path,
  * time grouped by model module (stem / encoder / mac.cell.read / ...)
    split into forward vs backward.

This is the tool that located the round-2 train-step bottleneck: threefry
dropout-mask generation rematerialized inside backward weight-gradient
fusions (see --prngImpl in README.md).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys


def load_events(logdir: str):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    return data["traceEvents"]


def summarize(events, steps: int, top: int):
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    op_time = collections.Counter()
    op_info = {}
    mod_time = collections.Counter()
    dir_time = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        # skip step markers and the whole-program envelope
        if re.fullmatch(r"\d+", name) or name.startswith("jit_"):
            continue
        dur = e.get("dur", 0)
        op_time[name] += dur
        args = e.get("args", {})
        if name not in op_info and args:
            op_info[name] = (str(args.get("source", "")),
                             str(args.get("tf_op", "")))
        tf_op = str(args.get("tf_op", ""))
        m = re.sub(r"^jit\([^)]*\)/", "", tf_op)
        back = "backward" if "transpose(jvp" in m else "forward"
        m = re.sub(r"(transpose\()?jvp\([^)]*\)\)?/", "", m)
        parts = [p for p in m.split("/") if p]
        mod = "/".join(parts[:3]) if parts else "(unattributed)"
        mod_time[mod] += dur
        dir_time[back] += dur

    total = sum(op_time.values())
    print(f"device op time: {total / steps / 1e3:.2f} ms/step "
          f"(forward {dir_time['forward'] / steps / 1e3:.2f}, "
          f"backward {dir_time['backward'] / steps / 1e3:.2f})")
    print(f"\n-- by module ({steps} step(s)) --")
    for mod, d in mod_time.most_common(top):
        print(f"{d / steps / 1e3:9.2f} ms/step  {mod}")
    print(f"\n-- top ops --")
    for name, d in op_time.most_common(top):
        src, tf_op = op_info.get(name, ("", ""))
        src = src.split("/")[-1]
        print(f"{d / steps / 1e3:9.3f} ms/step  {name[:36]:38s} "
              f"{src:28s} {tf_op[:70]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of jitted steps captured inside the trace "
                         "(durations are divided by this)")
    ap.add_argument("--top", type=int, default=25)
    ns = ap.parse_args()
    summarize(load_events(ns.logdir), ns.steps, ns.top)


if __name__ == "__main__":
    main()
