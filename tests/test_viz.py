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
