"""Shared harness for the per-variant convergence tests: train a small MAC
on the image-attention synthetic task (data/synthetic.make_attention_task)
and report held-out accuracy.  Used by tests/test_convergence.py and by the
calibration runs; kept importable so the bars are reproducible."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mac_network_tpu.config import Config
from mac_network_tpu.data.preprocess import tokenize, vectorize_2d
from mac_network_tpu.data.synthetic import make_attention_task
from mac_network_tpu.models import MACNetwork
from mac_network_tpu.train import (
    create_train_state, make_eval_step, make_optimizer, make_train_step)

DIMS = (8, 6, 6)                     # C, H, W
N_IMAGES = 32


def conv_cfg(**overrides) -> Config:
    cfg = Config()
    cfg.dataset = "CLEVR"
    cfg.wrdEmbDim = 32
    cfg.encDim = cfg.ctrlDim = cfg.memDim = cfg.attDim = cfg.stemDim = 48
    cfg.netLength = 3
    cfg.outClassifierDims = [48]
    cfg.imageDims = [DIMS[1], DIMS[2], DIMS[0]]
    cfg.batchSize = 64
    cfg.lr = 3e-3
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def build_data(n_train: int = 640, n_val: int = 160, seed: int = 7
               ) -> Tuple[Dict, Dict, Dict]:
    """(train, val, meta): vectorized arrays over a shared scene set, with
    val drawn from a fresh question stream (unseen question/image pairs)."""
    train_inst, feats = make_attention_task(
        n_train, N_IMAGES, dims=DIMS, seed=seed, question_seed=seed + 1)
    val_inst, _ = make_attention_task(
        n_val, N_IMAGES, dims=DIMS, seed=seed, question_seed=seed + 2)

    vocab: Dict[str, int] = {"<PAD>": 0, "<UNK>": 1}
    answers: Dict[str, int] = {}
    for inst in train_inst + val_inst:
        for tok in tokenize(inst["question"]):
            vocab.setdefault(tok, len(vocab))
        answers.setdefault(inst["answer"], len(answers))

    def vectorize(instances):
        enc = [[vocab[t] for t in tokenize(i["question"])] for i in instances]
        qs, lengths = vectorize_2d(enc, pad_multiple=4)
        ans = np.asarray([answers[i["answer"]] for i in instances], np.int32)
        imgs = np.stack([feats[i["image_index"]].transpose(1, 2, 0)
                         for i in instances])
        return {"questions": qs, "questionLengths": lengths,
                "answers": ans, "images": imgs,
                "mask": np.ones((len(instances),), np.float32)}

    meta = {"vocab": vocab, "answers": answers}
    return vectorize(train_inst), vectorize(val_inst), meta


def train_to_bar(cfg: Config, train: Dict, val: Dict, max_epochs: int = 60,
                 bar: float = 0.0, seed: int = 0, log=lambda *_: None
                 ) -> float:
    """Train; return the best val accuracy seen (early-exit once >= bar)."""
    cfg.questionWordsNum = int(train["questions"].max()) + 2
    cfg.answerWordsNum = int(max(train["answers"].max(),
                                 val["answers"].max())) + 1

    rng = np.random.RandomState(seed)
    emb = {"q": (rng.randn(cfg.questionWordsNum - 1, cfg.wrdEmbDim)
                 .astype(np.float32) * 0.1), "a": None}
    model = MACNetwork(cfg, emb)
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        jnp.asarray(train["questions"][:2]),
        jnp.asarray(train["questionLengths"][:2]),
        jnp.asarray(train["images"][:2]), train=False)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    train_step = make_train_step(model, cfg, tx)
    eval_step = make_eval_step(model, cfg)

    n = len(train["answers"])
    B = cfg.batchSize
    key = jax.random.key(seed + 2)
    best = 0.0
    for epoch in range(max_epochs):
        order = rng.permutation(n)
        for start in range(0, n - B + 1, B):
            sel = order[start:start + B]
            batch = {k: jnp.asarray(v[sel]) for k, v in train.items()}
            state, metrics = train_step(state, batch, cfg.lr, key)
        if epoch % 2 == 1 or epoch == max_epochs - 1:
            acc = evaluate(cfg, state, eval_step, val)
            best = max(best, acc)
            log(epoch, float(metrics["loss"]), acc)
            if bar and best >= bar:
                break
    return best


def evaluate(cfg: Config, state, eval_step, val: Dict) -> float:
    n = len(val["answers"])
    B = cfg.batchSize
    correct = 0.0
    # raw params: at the few hundred steps these tests run, EMA (decay
    # 0.999) is still dominated by the random init — the reference's
    # EMA-eval semantics only pay off over full-length training runs
    params = state.eval_params(use_ema=False)
    for start in range(0, n, B):
        sel = slice(start, min(start + B, n))
        chunk = {k: v[sel] for k, v in val.items()}
        m = len(chunk["answers"])
        if m < B:               # pad tail to the jitted shape
            pad = B - m
            chunk = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                     for k, v in chunk.items()}
            chunk["mask"] = np.concatenate(
                [np.ones((m,), np.float32), np.zeros((pad,), np.float32)])
        out = eval_step(params, state.batch_stats,
                        {k: jnp.asarray(v) for k, v in chunk.items()})
        correct += float(out["correct"])
    return correct / n
