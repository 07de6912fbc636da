"""Drive the visualization CLI on predictions produced by the e2e pipeline
(the reference's de-facto integration test — SURVEY.md §4)."""

import json
import os
import sys

import numpy as np
import pytest


def test_visualization_renders(tmp_path, monkeypatch):
    # synthesize a preds JSON with attention maps (driver schema)
    exp = "viztest"
    preds_dir = tmp_path / "preds" / exp
    preds_dir.mkdir(parents=True)
    T, H, W, L = 3, 5, 5, 6
    rng = np.random.RandomState(0)
    insts = []
    for i in range(3):
        kb = rng.rand(T, H * W); kb /= kb.sum(-1, keepdims=True)
        qa = rng.rand(T, L); qa /= qa.sum(-1, keepdims=True)
        insts.append({
            "index": i,
            "imageId": i,
            "question": "what color is the big sphere",
            "answer": "red",
            "prediction": "red" if i % 2 == 0 else "blue",
            "attentions": {
                "kb": kb.tolist(),
                "question": qa.tolist(),
                "gate": rng.rand(T, 1).tolist(),
            },
        })
    with open(preds_dir / f"valPredictions-{exp}.json", "w") as f:
        json.dump(insts, f)

    import visualization
    args = visualization.build_parser().parse_args([
        "--expName", exp, "--tier", "val",
        "--predsDir", str(tmp_path / "preds"),
        "--imagesDir", str(tmp_path / "noimages"),  # missing -> placeholder
        "--maxNum", "2", "--gate",
        "--imageDims", str(H), str(W),
    ])
    visualization.main(args)

    files = os.listdir(preds_dir)
    # per-step KB overlays + question heatmap for 2 instances
    assert any(f.endswith("Img_1.png") for f in files)
    assert any(f.endswith("Img_3.png") for f in files)
    assert any("text_RIGHT" in f for f in files)
    assert any("text_WRONG" in f for f in files)


def test_visualization_renders_gqa_objects(tmp_path):
    """GQA object attention ([T, 1*objectsNum] maps over a [1, N] grid)
    renders through the same CLI (attention-map export for the GQA-style
    path, BASELINE.json configs)."""
    exp = "vizgqa"
    preds_dir = tmp_path / "preds" / exp
    preds_dir.mkdir(parents=True)
    T, N, L = 2, 10, 5
    rng = np.random.RandomState(1)
    insts = []
    for i in range(2):
        kb = rng.rand(T, N); kb /= kb.sum(-1, keepdims=True)
        qa = rng.rand(T, L); qa /= qa.sum(-1, keepdims=True)
        insts.append({
            "index": i, "imageId": f"img{i}",
            "question": "what color is the marked object",
            "answer": "red", "prediction": "red",
            "attentions": {"kb": kb.tolist(), "question": qa.tolist()},
        })
    with open(preds_dir / f"valPredictions-{exp}.json", "w") as f:
        json.dump(insts, f)

    import visualization
    args = visualization.build_parser().parse_args([
        "--expName", exp, "--tier", "val",
        "--predsDir", str(tmp_path / "preds"),
        "--imagesDir", str(tmp_path / "noimages"),
        "--maxNum", "2",
        "--imageDims", "1", str(N),
    ])
    visualization.main(args)
    files = os.listdir(preds_dir)
    assert any(f.endswith("Img_1.png") for f in files)


def test_visualization_filters(tmp_path):
    import visualization
    args = visualization.build_parser().parse_args(
        ["--filter", "mod", "--filterMod"])
    right = {"answer": "a", "prediction": "a", "question": "q"}
    wrong = {"answer": "a", "prediction": "b", "question": "q"}
    # reference semantics (visualization.py:103-107): with --filterMod,
    # wrong instances are skipped and right ones kept
    assert visualization.should_skip(args, wrong) is True
    assert visualization.should_skip(args, right) is False


def test_trace_summary_tool(tmp_path, capsys):
    """tools/trace_summary.py parses a Chrome-trace dump and attributes
    device op time by module and direction."""
    import gzip, json, sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import trace_summary

    trace = {"traceEvents": [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 2000,
         "args": {"source": "a.py:1",
                  "tf_op": "jit(step)/jvp(Net)/stem/conv/x:"}},
        {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 1000,
         "args": {"source": "b.py:2",
                  "tf_op": "jit(step)/transpose(jvp(Net))/stem/conv/x:"}},
        {"ph": "X", "pid": 3, "name": "jit_step", "dur": 9999, "args": {}},
        {"ph": "X", "pid": 9, "name": "host_thing", "dur": 5000, "args": {}},
    ]}
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    events = trace_summary.load_events(str(tmp_path))
    trace_summary.summarize(events, steps=1, top=5)
    out = capsys.readouterr().out
    assert "device op time: 3.00 ms/step" in out
    assert "forward 2.00" in out and "backward 1.00" in out
    assert "stem/conv/x:" in out
