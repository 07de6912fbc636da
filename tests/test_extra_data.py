"""Extra-dataset (CLEVR-Humans-style) support: H-suffix tiers share the
main tier's images and alternate into training batches
(reference: preprocess.py:657-663, main.py:205-218, 343-372)."""

import json
import os

import pytest

from mac_network_tpu.config import Config, load_dataset_config
from mac_network_tpu.data import Preprocesser
from mac_network_tpu.data.synthetic import (
    make_clevr_questions, write_synthetic_dataset)
from mac_network_tpu.train.driver import alternate_data, choose_training_data
from mac_network_tpu.data.loader import get_batches, get_length


@pytest.fixture
def extra_root(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_train=32, n_val=16, n_test=16,
                            dims=(4, 3, 3))
    data_dir = os.path.join(str(tmp_path), "CLEVR_v1", "data")
    # H-suffix question files (same images as the main tiers)
    for tier in ("train", "val", "test"):
        with open(os.path.join(data_dir,
                               f"CLEVR_{tier}H_questions.json"), "w") as f:
            json.dump(make_clevr_questions(12, seed=99), f)
    return tmp_path


def make_cfg(root, **overrides):
    cfg = Config()
    cfg.dataset = "CLEVR"
    cfg.dataBasedir = str(root)
    cfg.extra = True
    cfg.alterExtra = True
    cfg.wrdEmbRandom = True
    cfg.wrdEmbUniform = True
    cfg.batchSize = 8
    for k, v in overrides.items():
        setattr(cfg, k, v)
    load_dataset_config(cfg)
    cfg.dataPath = os.path.join(str(root), "CLEVR_v1", "data")
    return cfg


def test_extra_dataset_preprocessing(extra_root):
    cfg = make_cfg(extra_root)
    p = Preprocesser(cfg)
    data, embeddings, answer_dict = p.preprocessData(verbose=False)
    assert data["extra"] is not None
    extra_train = data["extra"]["train"]
    # extra tiers reuse main images (reference: preprocess.py:662-663)
    assert extra_train["images"]["imagesFilename"] == \
        data["main"]["train"]["images"]["imagesFilename"]
    # extra vocab words merged into the shared dictionaries
    assert cfg.questionWordsNum > 0
    total = sum(get_length(b) for b in extra_train["data"])
    assert total == 12


def test_alternation_inserts_extra_batches(extra_root):
    cfg = make_cfg(extra_root, alterNum=2)
    p = Preprocesser(cfg)
    data, _, _ = p.preprocessData(verbose=False)
    training, alter = choose_training_data(cfg, data)
    assert alter is not None

    batches = []
    for bucket in training["data"]:
        batches += get_batches(bucket, cfg.batchSize)
    n_main = len(batches)
    data_len = sum(get_length(b) for b in training["data"])
    batches, data_len2 = alternate_data(cfg, batches, alter, data_len)
    assert len(batches) > n_main
    assert data_len2 > data_len


def test_train_extra_selects_extra(extra_root):
    cfg = make_cfg(extra_root, trainExtra=True)
    p = Preprocesser(cfg)
    data, _, _ = p.preprocessData(verbose=False)
    training, _ = choose_training_data(cfg, data)
    total = sum(get_length(b) for b in training["data"])
    assert total == 12          # the extra tier, not the 32-question main
