"""End-to-end training tests on the synthetic CLEVR dataset: the full CLI
pipeline (preprocess -> train -> eval -> checkpoints -> CSV -> preds) and a
train-to-overfit check (SURVEY.md §4 test strategy)."""

import json
import os

import numpy as np
import pytest

import jax

from mac_network_tpu.config import Config, load_dataset_config
from mac_network_tpu.data.synthetic import write_synthetic_dataset


H = W = 5
C = 16


def make_cfg(tmp_path, **overrides):
    cfg = Config()
    cfg.expName = "e2etest"
    cfg.dataset = "CLEVR"
    cfg.dataBasedir = str(tmp_path)
    cfg.wrdEmbRandom = True
    cfg.wrdEmbUniform = True
    cfg.encBi = True
    cfg.outQuestion = True
    cfg.controlContextual = True
    cfg.controlInputUnshared = True
    cfg.readProjInputs = True
    cfg.readMemConcatKB = True
    cfg.readMemConcatProj = True
    cfg.readMemProj = True
    cfg.readCtrl = True
    cfg.writeMemProj = True
    cfg.initCtrl = "Q"
    cfg.useEMA = True
    cfg.clipGradients = True
    cfg.relu = "ELU"
    # small model for CPU
    cfg.wrdEmbDim = 16
    cfg.encDim = 32
    cfg.ctrlDim = 32
    cfg.memDim = 32
    cfg.attDim = 32
    cfg.stemDim = 32
    cfg.netLength = 2
    cfg.outClassifierDims = [32]
    cfg.batchSize = 16
    cfg.epochs = 2
    cfg.lr = 3e-3
    cfg.train = True
    cfg.getPreds = True
    cfg.evalTrain = True
    cfg.weightsPath = str(tmp_path / "weights")
    cfg.predsPath = str(tmp_path / "preds")
    cfg.logPath = str(tmp_path / "results")
    cfg.configPath = str(tmp_path / "results")
    for k, v in overrides.items():
        setattr(cfg, k, v)
    load_dataset_config(cfg)
    cfg.dataPath = os.path.join(str(tmp_path), "CLEVR_v1", "data")
    cfg.imageDims = [H, W, C]
    return cfg


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clevr")
    write_synthetic_dataset(str(root), n_train=48, n_val=24, n_test=24,
                            dims=(C, H, W))
    return root


def test_full_cli_pipeline(dataset_root):
    from main import main
    cfg = make_cfg(dataset_root)
    main(cfg)

    # CSV log exists with header + 2 epoch rows
    with open(cfg.logFile()) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert lines[0] == cfg.expName
    assert lines[1].startswith("epoch,trainAcc,valAcc")
    assert len(lines) >= 4
    # checkpoints kept per weightsToKeep
    assert os.path.isdir(cfg.weightsFile(2))
    # preds written and decodable
    with open(cfg.predsFile("val")) as f:
        preds = json.load(f)
    assert len(preds) > 0
    assert all("prediction" in p for p in preds)
    # indices sorted (reference: preprocess.py:267)
    idx = [p["index"] for p in preds]
    assert idx == sorted(idx)


def test_restore_and_final_test(dataset_root):
    from main import main
    cfg = make_cfg(dataset_root, train=False, finalTest=True, restore=True,
                   getAtt=True)
    main(cfg)
    with open(cfg.predsFile("test")) as f:
        preds = json.load(f)
    assert len(preds) > 0
    p = preds[0]
    assert "attentions" in p
    assert "kb" in p["attentions"] and "question" in p["attentions"]
    assert len(p["attentions"]["kb"]) == cfg.netLength
    assert len(p["attentions"]["kb"][0]) == H * W


def test_overfit_small_subset(dataset_root, tmp_path):
    """Training must drive train accuracy well above chance on a small
    synthetic subset — exercises the full grad/Adam/EMA path."""
    from main import main
    cfg = make_cfg(dataset_root, expName="overfit", epochs=10, lr=5e-3,
                   trainedNum=32, testedNum=16,
                   weightsPath=str(tmp_path / "w"),
                   predsPath=str(tmp_path / "p"),
                   logPath=str(tmp_path / "r"),
                   configPath=str(tmp_path / "r"))
    main(cfg)
    with open(cfg.logFile()) as f:
        lines = [l.strip() for l in f if l.strip()]
    last = lines[-1].split(",")
    train_acc = float(last[1])
    first = lines[2].split(",")
    first_loss = float(first[3])
    last_loss = float(last[3])
    assert last_loss < first_loss, (first_loss, last_loss)
    assert train_acc > 0.4, train_acc   # >> 1/answerWords chance


def test_resume_continues_training(dataset_root, tmp_path):
    """--restore resumes training at the logged epoch with the logged lr
    and extends the same CSV (reference: main.py:59-64, 185-201, 701)."""
    from main import main
    paths = dict(weightsPath=str(tmp_path / "w"), predsPath=str(tmp_path / "p"),
                 logPath=str(tmp_path / "r"), configPath=str(tmp_path / "r"))
    cfg = make_cfg(dataset_root, expName="resume", epochs=2,
                   getPreds=False, evalTrain=False, **paths)
    main(cfg)
    with open(cfg.logFile()) as f:
        n_before = sum(1 for l in f if l.strip())

    cfg2 = make_cfg(dataset_root, expName="resume", epochs=4, restore=True,
                    getPreds=False, evalTrain=False, lr=999.0, **paths)
    main(cfg2)
    assert cfg2.restoreEpoch == 2
    assert cfg2.lr != 999.0            # lr came from the CSV tail, not CLI
    with open(cfg2.logFile()) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert len(lines) == n_before + 2  # epochs 3 and 4 appended
    assert lines[-1].startswith("4,")
    assert os.path.isdir(cfg2.weightsFile(4))
