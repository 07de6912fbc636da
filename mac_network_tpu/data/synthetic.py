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


def write_nlvr_attention_task(root: str, n_train: int = 256, n_val: int = 64,
                              n_test: int = 32,
                              feature_type: str = "norm_8x4", seed: int = 0):
    """Image-DEPENDENT synthetic NLVR (round-2 VERDICT missing #6): the
    reference NLVR layout (jsonl sentences x 6 rendered images each, binary
    labels — reference: preprocess.py:275-315) where the label can only be
    computed by looking at the images.

    Each sentence asks "there is a <color> box ..."; its 6 images all
    plant one box of the scene's true color at random cells (consistent
    with real NLVR, where the 6 renderings share the label).  The label is
    true iff the asked color matches the planted color, balanced 50/50 —
    a text-only model is capped at the ~0.5 prior, while solving the task
    requires locating the box and reading its color channel.
    """
    import h5py
    color_vecs = {
        "red": np.asarray([5.0, 0.0, 0.0], np.float32),
        "green": np.asarray([0.0, 5.0, 0.0], np.float32),
        "blue": np.asarray([0.0, 0.0, 5.0], np.float32),
        "yellow": np.asarray([4.0, 4.0, 0.0], np.float32),
    }
    color_names = sorted(color_vecs)
    rng = np.random.RandomState(seed)
    data_dir = os.path.join(root, "nlvr")
    os.makedirs(data_dir, exist_ok=True)
    w, h = (int(v) for v in feature_type.split("_")[-1].split("x"))
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for t_i, (tier, n) in enumerate(counts.items()):
        trng = np.random.RandomState(seed + 1000 * (t_i + 1))
        ids = {}
        feats = []
        with open(os.path.join(data_dir, f"{tier}.json"), "w") as f:
            for i in range(n):
                true_color = color_names[trng.randint(len(color_names))]
                if trng.rand() < 0.5:
                    asked, label = true_color, "true"
                else:
                    others = [c for c in color_names if c != true_color]
                    asked, label = others[trng.randint(3)], "false"
                sentence = f"There is a {asked} box in the image."
                ident = f"{tier}-{i}"
                f.write(json.dumps({"sentence": sentence, "label": label,
                                    "identifier": ident}) + "\n")
                for k in range(6):
                    img = trng.randn(3, h, w).astype(np.float32) * 0.1
                    y, x = trng.randint(h), trng.randint(w)
                    img[:, y, x] += color_vecs[true_color]
                    ids[f"{ident}-{k}"] = len(feats)
                    feats.append(img)
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


# ------------------------------------------------------------ attention task

def make_attention_task(n_questions: int, n_images: int,
                        dims=(8, 6, 6), n_colors: int = 4, seed: int = 0,
                        question_seed: Optional[int] = None):
    """A compositional task that REQUIRES image attention (unlike
    ``make_clevr_questions``, whose answers are functions of the question
    text alone): each image plants one object per shape at a random grid
    cell, with the cell's feature vector encoding (shape, color); questions
    ask for the color of a named shape or whether a (color, shape) pair
    exists.  The same question has different answers on different images,
    so a model can only solve it by locating the right cell — the synthetic
    stand-in for CLEVR's "attend to the right object" requirement used by
    the per-variant convergence tests.

    Returns (instances, features):
      instances: list of {"question", "answer", "imageId", "program"}
      features:  [n_images, C, H, W] float32 (reference h5 layout,
                 extract_features.py:98-101)
    """
    C, H, W = dims
    rng = np.random.RandomState(seed)
    colors = _COLORS[:n_colors]
    shapes = _SHAPES

    # fixed random codes; cell feature = shape_code + color_code (+ noise)
    shape_codes = rng.randn(len(shapes), C).astype(np.float32) * 2.0
    color_codes = rng.randn(len(colors), C).astype(np.float32) * 2.0

    features = rng.randn(n_images, C, H, W).astype(np.float32) * 0.1
    scene = []          # per image: {shape_idx: color_idx}
    for i in range(n_images):
        cells = rng.choice(H * W, size=len(shapes), replace=False)
        placed = {}
        for s, cell in enumerate(cells):
            c = int(rng.randint(len(colors)))
            placed[s] = c
            y, x = divmod(int(cell), W)
            features[i, :, y, x] += shape_codes[s] + color_codes[c]
        scene.append(placed)

    # separate question stream so different tiers can draw fresh
    # (question, image) pairs over the SAME scenes
    qrng = (np.random.RandomState(question_seed)
            if question_seed is not None else rng)
    rng = qrng
    instances = []
    for q in range(n_questions):
        img = int(rng.randint(n_images))
        s = int(rng.randint(len(shapes)))
        if rng.rand() < 0.5:
            text = f"What color is the {shapes[s]}?"
            answer = colors[scene[img][s]]
            fn = "query_color"
        else:
            c = int(rng.randint(len(colors)))
            text = f"Is there a {colors[c]} {shapes[s]}?"
            answer = "yes" if scene[img][s] == c else "no"
            fn = "exist"
        program = [
            {"function": "scene", "value_inputs": [], "inputs": []},
            {"function": f"filter_shape", "value_inputs": [shapes[s]],
             "inputs": [0]},
            {"function": fn, "value_inputs": [], "inputs": [1]},
        ]
        instances.append({"question": text, "answer": answer,
                          "image_index": img, "program": program})
    return instances, features


def write_attention_dataset(root: str, n_train: int = 512, n_val: int = 128,
                            n_test: int = 128, n_images: int = 48,
                            dims=(8, 6, 6), seed: int = 0):
    """Materialize the attention task in the CLEVR directory layout (same
    files as ``write_synthetic_dataset``), sharing one image set across
    tiers so val/test measure generalization to unseen (question, image)
    pairs, not unseen feature noise."""
    data_dir = os.path.join(root, "CLEVR_v1", "data")
    os.makedirs(data_dir, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for t_i, (tier, n) in enumerate(counts.items()):
        # same scene seed -> same images; distinct question seed per tier
        # -> val/test are unseen (question, image) pairs over known scenes
        instances, features = make_attention_task(
            n, n_images, dims=dims, seed=seed, question_seed=seed + 101 * (t_i + 1))
        qpath = os.path.join(data_dir, f"CLEVR_{tier}_questions.json")
        with open(qpath, "w") as f:
            json.dump({"questions": instances}, f)
        try:
            import h5py
            with h5py.File(os.path.join(data_dir, f"{tier}.h5"), "w") as hf:
                hf.create_dataset("features", data=features)
        except ImportError:
            np.save(os.path.join(data_dir, f"{tier}.npy"), features)
    return root


def write_synthetic_gqa(root: str, n_train: int = 256, n_val: int = 64,
                        n_test: int = 32, objects_num: int = 12,
                        object_dim: int = 16, seed: int = 0):
    """Materialize a synthetic GQA tree under ``root``/gqa:
    {tier}_questions.json (dict of qid -> {question, answer, imageId}),
    {tier}_objects.h5 [N, objectsNum, objectDim], {tier}ImgIds.json and
    {tier}ImgInfo.json (per-image valid-object counts).  The reference's
    GQA adaptation lives on an unvendored branch (readme.md:13); this
    follows the GQA release's object-features layout.

    The task is object-dependent AND masking-sensitive: each image plants
    one "marked" object whose color channel block answers the question,
    always at a VALID slot; padded slots are filled with garbage that a
    correct kb-mask implementation must ignore.
    """
    import h5py
    color_names = ["red", "green", "blue", "yellow"]
    rng = np.random.RandomState(seed)
    data_dir = os.path.join(root, "gqa")
    os.makedirs(data_dir, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for t_i, (tier, n) in enumerate(counts.items()):
        trng = np.random.RandomState(seed + 1000 * (t_i + 1))
        questions = {}
        ids = {}
        info = {}
        feats = []
        for i in range(n):
            img_id = f"{tier}_img{i}"
            n_valid = int(trng.randint(3, objects_num + 1))
            obj = trng.randn(objects_num, object_dim).astype(np.float32) * 0.1
            # garbage in PADDED slots: huge activations that would dominate
            # attention if the mask were ignored
            if n_valid < objects_num:
                obj[n_valid:] = trng.randn(
                    objects_num - n_valid, object_dim).astype(np.float32) * 50.0
            color = int(trng.randint(len(color_names)))
            slot = int(trng.randint(n_valid))
            obj[slot, :4] = 0.0
            obj[slot, color] = 5.0                  # marker channel
            obj[slot, 4] = 5.0                      # "marked object" flag
            ids[img_id] = len(feats)
            info[img_id] = n_valid
            feats.append(obj)
            questions[f"{tier}q{i}"] = {
                "question": "What color is the marked object?",
                "answer": color_names[color],
                "imageId": img_id,
            }
        with open(os.path.join(data_dir, f"{tier}_questions.json"), "w") as f:
            json.dump(questions, f)
        with h5py.File(os.path.join(data_dir, f"{tier}_objects.h5"),
                       "w") as hf:
            hf.create_dataset("features", data=np.stack(feats))
        with open(os.path.join(data_dir, f"{tier}ImgIds.json"), "w") as f:
            json.dump(ids, f)
        with open(os.path.join(data_dir, f"{tier}ImgInfo.json"), "w") as f:
            json.dump(info, f)
    return root
