"""Exhaustive single-flag sweep: every model-shaping flag path must build
and produce finite logits (train and eval).  This is the safety net for
the reference's ~150-flag behavioral surface (SURVEY.md §2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mac_network_tpu.models import MACNetwork
from tests.test_model import (small_cfg, make_inputs, make_embedding_init,
                              B, ANSWERS)

# base flags: the words fed to the control unit must be ctrlDim-sized, so
# the base uses contextual words (as every shipped config does); the
# non-contextual case sets wrdEmbDim == ctrlDim explicitly (the reference
# has the same implicit requirement: mac_cell.py:41-44 declares
# questionWords as [B, L, ctrlDim])
BASE = dict(controlContextual=True, encBi=True, outQuestion=True,
            readProjInputs=True, readMemProj=True, readCtrl=True,
            writeMemProj=True)

# each case: dict of overrides on top of BASE
CASES = {
    # stem
    "stemLinear": dict(stemLinear=True),
    "stemKernelSizes": dict(stemKernelSizes=[3, 5], stemStrideSizes=[1, 1]),
    "stemBN": dict(stemBN=True, bnCenter=True, bnScale=True),
    "stemGridRnn": dict(stemGridRnn=True, stemGridRnnMod="GRU",
                        stemGridAct="TANH"),
    "locationL_CNCT": dict(locationAware=True, locationType="L"),
    "locationPE": dict(locationAware=True, locationType="PE", locationDim=8),
    # encoder
    "encProj": dict(encProj=True, encProjQAct="TANH"),
    "encDimMismatch": dict(encDim=32),       # forces projections
    "encNumLayers2": dict(encNumLayers=2),
    "encVariationalDropout": dict(encVariationalDropout=True,
                                  encStateDropout=0.9),
    "wrdEmbFixed": dict(wrdEmbFixed=True),
    "relu_PRM": dict(relu="PRM"),
    "relu_LKY": dict(relu="LKY"),
    "relu_SELU": dict(relu="SELU"),
    "mulBias": dict(mulBias=0.5),
    # output unit
    "outImage": dict(outImage=True, outImageDim=16),
    "outQuestionMul": dict(outQuestion=True, outQuestionMul=True),
    "outClassifierDims2": dict(outClassifierDims=[24, 16]),
    "outputBN": dict(outputBN=True, bnCenter=True, bnScale=True),
    # init
    "initZERO": dict(initCtrl="ZERO", initMem="ZERO"),
    "initQ": dict(initCtrl="Q", initMem="Q"),
    "initKB_CNCT": dict(initKBwithQ="CNCT"),
    "initKB_MUL": dict(initKBwithQ="MUL"),
    "addNullWord": dict(addNullWord=True),
    # control unit
    "controlWholeQ": dict(controlWholeQ=True),
    "controlContinuous": dict(controlContinuous=True),
    "controlConcatWords": dict(controlConcatWords=True),
    "controlProj": dict(controlProj=True, controlProjAct="RELU"),
    "controlInWordsProj": dict(controlInWordsProj=True),
    "controlOutWordsProj": dict(controlOutWordsProj=True),
    "controlNonContextual": dict(controlContextual=False, wrdEmbDim=24),
    "controlFeedPrev_noAtt": dict(controlFeedPrev=True,
                                  controlFeedPrevAtt=False),
    # read unit
    "readProjShared": dict(readProjInputs=True, readProjShared=True),
    "readNoProj": dict(readProjInputs=False, readMemProj=False),
    "readMem_DIAG": dict(readMemAttType="DIAG"),
    "readMem_BL": dict(readMemAttType="BL"),
    "readMem_ADD": dict(readMemAttType="ADD"),
    "readMemConcatRaw": dict(readProjInputs=True, readMemConcatKB=True,
                             readMemConcatProj=False, readMemProj=True),
    "readCtrl_DIAG": dict(readCtrl=True, readCtrlAttType="DIAG"),
    "readCtrl_ADD": dict(readCtrl=True, readCtrlAttType="ADD"),
    "readCtrlConcatInter": dict(readCtrl=True, readCtrlConcatInter=True),
    "readCtrlConcatKB": dict(readProjInputs=True, readCtrl=True,
                             readCtrlConcatKB=True, readCtrlConcatProj=True),
    "readSmryKBProj": dict(readProjInputs=True, readSmryKBProj=True),
    # write unit
    "writeMEM": dict(writeInputs="MEM"),
    "writeINFO": dict(writeInputs="INFO"),
    "writeSUM": dict(writeInputs="SUM"),
    "writeConcatMul": dict(writeInputs="BOTH", writeConcatMul=True),
    "writeInfoProj": dict(writeInfoProj=True, writeInfoAct="TANH"),
    "writeMergeCtrl": dict(writeMergeCtrl=True),
    "writeSelfAtt_plain": dict(writeSelfAtt=True, writeSelfAttMod="NON"),
    "writeGateShared": dict(writeGate=True, writeGateShared=True,
                            writeGateBias=2.0),
    "writeMemAct": dict(writeMemAct="TANH"),
    "memoryBN": dict(memoryBN=True, bnCenter=True, bnScale=True),
    # dropout variants
    "memoryVarDp": dict(memoryVariationalDropout=True),
    "writeDropout": dict(writeDropout=0.8),
    # embeddings
    "ansEmb_BOTH_MUL": dict(ansEmbMod="BOTH", answerMod="MUL"),
    "ansEmb_SHARED_DIAG": dict(ansEmbMod="SHARED", answerMod="DIAG"),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_flag_path(name):
    cfg = small_cfg(**{**BASE, **CASES[name]})
    model = MACNetwork(cfg, make_embedding_init(cfg))
    qs, lengths, images, _ = make_inputs()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images, train=False)
    logits, _ = model.apply(variables, qs, lengths, images, train=False)
    assert logits.shape == (B, ANSWERS), name
    assert np.isfinite(np.asarray(logits)).all(), name
    # train mode too (dropout + BN mutations)
    out = model.apply(variables, qs, lengths, images, train=True,
                      rngs={"dropout": jax.random.key(2)},
                      mutable=["batch_stats"])
    logits_t = out[0][0]
    assert np.isfinite(np.asarray(logits_t)).all(), name
