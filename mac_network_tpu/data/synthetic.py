"""Synthetic CLEVR-shaped dataset for tests and benchmarks.

The reference has no tests; SURVEY.md §4 calls for "a tiny synthetic dataset
(random features + templated questions) enabling end-to-end train-to-overfit
tests on CPU".  This generates:
  * CLEVR-format question JSONs (templated questions with learnable
    question->answer mappings and simple functional programs),
  * random image feature tensors [N, C, H, W] compatible with the
    extract_features.py h5 layout (written via the loader's npy cache or h5).
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np

_COLORS = ["red", "blue", "green", "yellow", "purple", "cyan"]
_SHAPES = ["cube", "sphere", "cylinder"]
_SIZES = ["large", "small"]


def make_clevr_questions(n: int, seed: int = 0):
    """Templated questions whose answer is a deterministic function of the
    question tokens (and image id), so a model can learn/overfit them."""
    rng = random.Random(seed)
    questions = []
    for i in range(n):
        color = rng.choice(_COLORS)
        shape = rng.choice(_SHAPES)
        size = rng.choice(_SIZES)
        kind = rng.randrange(3)
        if kind == 0:
            text = f"What color is the {size} {shape}?"
            answer = color
            fn = "query_color"
        elif kind == 1:
            text = f"Is there a {color} {shape}?"
            answer = "yes" if (len(color) + len(shape)) % 2 == 0 else "no"
            fn = "exist"
        else:
            text = f"How many {color} {size} objects are there?"
            # answer is a pure function of the question text so the mapping
            # is learnable (overfit tests rely on this)
            answer = str((len(color) + len(size)) % 4)
            fn = "count"
        program = [
            {"function": "scene", "value_inputs": [], "inputs": []},
            {"function": f"filter_color", "value_inputs": [color],
             "inputs": [0]},
            {"function": fn, "value_inputs": [], "inputs": [1]},
        ]
        questions.append({
            "question": text,
            "answer": answer,
            "image_index": i % max(1, n // 2),
            "program": program,
        })
    return {"questions": questions}


def make_features(num_images: int, dims=(1024, 14, 14), seed: int = 0):
    """Random 'ResNet stage-3' features [N, C, H, W] (reference layout:
    extract_features.py:98-101)."""
    rng = np.random.RandomState(seed)
    return rng.randn(num_images, *dims).astype(np.float32)


def write_synthetic_nlvr(root: str, n_train: int = 8, n_val: int = 4,
                         n_test: int = 4, feature_type: str = "norm_8x4",
                         seed: int = 0):
    """Materialize a synthetic NLVR tree under ``root``/nlvr:
    {tier}.json (jsonl), {tier}_{featureType}.h5 and {tier}ImgIds.json
    (reference layout: preprocess.py:275-315, main.py:317-331).

    feature_type 'norm_WxH' yields [H, W, 3] images (config.py:461-466).
    """
    import h5py
    rng = random.Random(seed)
    nrng = np.random.RandomState(seed)
    data_dir = os.path.join(root, "nlvr")
    os.makedirs(data_dir, exist_ok=True)
    w, h = (int(v) for v in feature_type.split("_")[-1].split("x"))
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for tier, n in counts.items():
        ids = {}
        feats = []
        with open(os.path.join(data_dir, f"{tier}.json"), "w") as f:
            for i in range(n):
                count = rng.randrange(1, 4)
                sentence = f"There are {count} black boxes in the image."
                label = "true" if count % 2 else "false"
                ident = f"{tier}-{i}"
                f.write(json.dumps({"sentence": sentence, "label": label,
                                    "identifier": ident}) + "\n")
                for k in range(6):
                    ids[f"{ident}-{k}"] = len(feats)
                    feats.append(nrng.randn(3, h, w).astype(np.float32))
        with h5py.File(os.path.join(data_dir,
                                    f"{tier}_{feature_type}.h5"), "w") as hf:
            hf.create_dataset("features", data=np.stack(feats))
        with open(os.path.join(data_dir, f"{tier}ImgIds.json"), "w") as f:
            json.dump(ids, f)
    return root


def write_synthetic_dataset(root: str, n_train: int = 64, n_val: int = 32,
                            n_test: int = 32, dims=(1024, 14, 14),
                            seed: int = 0, h5: Optional[bool] = None):
    """Materialize a synthetic CLEVR directory tree under ``root``:
    CLEVR_v1/data/{CLEVR_{tier}_questions.json, {tier}.h5 or {tier}.npy}.

    Returns the data-basedir to pass as --dataBasedir.
    """
    data_dir = os.path.join(root, "CLEVR_v1", "data")
    os.makedirs(data_dir, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    if h5 is None:
        try:
            import h5py  # noqa: F401
            h5 = True
        except ImportError:
            h5 = False
    for tier, n in counts.items():
        qpath = os.path.join(data_dir, f"CLEVR_{tier}_questions.json")
        with open(qpath, "w") as f:
            json.dump(make_clevr_questions(n, seed=seed + hash(tier) % 1000), f)
        feats = make_features(max(1, n // 2), dims=dims,
                              seed=seed + hash(tier) % 1000)
        if h5:
            import h5py
            with h5py.File(os.path.join(data_dir, f"{tier}.h5"), "w") as hf:
                hf.create_dataset("features", data=feats)
        else:
            np.save(os.path.join(data_dir, f"{tier}.npy"), feats)
    return root
