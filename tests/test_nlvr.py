"""NLVR dataset path end-to-end: jsonl reader with 6-image replication,
imageIds h5 indexing, feature-type-derived dims, training epoch
(reference: preprocess.py:275-315, config.py:437-466)."""

import os

import pytest

from mac_network_tpu.config import Config, load_dataset_config
from mac_network_tpu.data.synthetic import write_synthetic_nlvr


def test_nlvr_train_e2e(tmp_path):
    from main import main
    write_synthetic_nlvr(str(tmp_path), n_train=8, n_val=4, n_test=4,
                         feature_type="norm_8x4")
    cfg = Config()
    cfg.expName = "nlvrtest"
    cfg.dataset = "NLVR"
    cfg.featureType = "norm_8x4"
    cfg.dataBasedir = str(tmp_path)
    cfg.wrdEmbRandom = True
    cfg.wrdEmbUniform = True
    cfg.encBi = True
    cfg.outQuestion = True
    cfg.controlContextual = True
    cfg.readProjInputs = True
    cfg.readMemProj = True
    cfg.readCtrl = True
    cfg.writeMemProj = True
    cfg.wrdEmbDim = 8
    cfg.encDim = cfg.ctrlDim = cfg.memDim = cfg.attDim = cfg.stemDim = 16
    cfg.netLength = 2
    cfg.outClassifierDims = [16]
    cfg.batchSize = 8
    cfg.epochs = 1
    cfg.train = True
    cfg.getPreds = True
    cfg.weightsPath = str(tmp_path / "w")
    cfg.predsPath = str(tmp_path / "p")
    cfg.logPath = str(tmp_path / "r")
    cfg.configPath = str(tmp_path / "r")
    load_dataset_config(cfg)
    assert cfg.imageDims == [4, 8, 3]

    main(cfg)

    with open(cfg.logFile()) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert len(lines) >= 3
    assert os.path.exists(cfg.predsFile("val"))
