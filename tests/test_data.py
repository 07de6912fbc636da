"""Golden tests for the host data pipeline: tokenizer, SymbolDict,
program translator, bucketing, vectorization, embedding init, loaders
(test strategy per SURVEY.md §4)."""

import json
import os
import pickle

import numpy as np
import pytest

from mac_network_tpu.config import Config, load_dataset_config
from mac_network_tpu.data.preprocess import (
    Preprocesser, tokenize, vectorize_2d, vectorize_3d, ALL_PUNCT)
from mac_network_tpu.data.program_translator import ProgramTranslator
from mac_network_tpu.data.symbol_dict import SymbolDict


# ------------------------------------------------------------- tokenizer

def test_tokenize_golden():
    # kept puncts become tokens; ignored puncts stripped; lowercased
    assert tokenize("What color is the big sphere?") == \
        ["what", "color", "is", "the", "big", "sphere"]
    assert tokenize("Yes, it is; really.") == \
        ["yes", ",", "it", "is", ";", "really", "."]
    assert tokenize("weird (stuff) here!") == ["weird", "stuff", "here"]
    assert tokenize("a/b\\c") == ["abc"]


def test_tokenize_nlvr_mode():
    # NLVR strips all punctuation and keeps none
    assert tokenize("There is a box, right?", ignored_puncts=ALL_PUNCT,
                    kept_puncts=()) == ["there", "is", "a", "box", "right"]


# ------------------------------------------------------------ SymbolDict

def test_symbol_dict_roundtrip():
    d = SymbolDict()
    d.addSeq(["red", "blue", "red"])
    d.createVocab()
    assert d.sym2id["<PAD>"] == 0 and d.sym2id["<UNK>"] == 1
    enc = d.encodeSequence(["red", "blue", "bogus"])
    assert enc[2] == 1                      # unknown
    assert d.decodeSequence(enc[:2]) == ["red", "blue"]
    # decode stops at invalid symbol
    assert d.decodeSequence([enc[0], 0, enc[1]]) == ["red"]
    # start/end/reverse options
    enc2 = d.encodeSequence(["red", "blue"], addStart=True, addEnd=True)
    assert enc2[0] == 2 and enc2[-1] == 3


def test_symbol_dict_min_count():
    d = SymbolDict()
    d.addSeq(["a"] * 3 + ["b"])
    d.createVocab(minCount=2)
    assert "a" in d.sym2id and "b" not in d.sym2id


# ----------------------------------------------------- program translator

def _program():
    # scene -> filter_color[red] -> count   plus a second branch
    return [
        {"function": "scene", "value_inputs": [], "inputs": []},
        {"function": "filter_color", "value_inputs": ["red"], "inputs": [0]},
        {"function": "count", "value_inputs": [], "inputs": [1]},
    ]


def test_program_translator_postfix_and_keys():
    t = ProgramTranslator(SymbolDict(), 2)
    post = t.programToPostfixProgram(_program())
    seq = t.programToSeq(post)
    assert seq == ["0_scene_scene_", "1_filter_color_red", "2_count_count_"][:0] \
        or seq == ["0_scene_scene_", "1_filter_color_red", "1_count_count_"]
    # arity prefix + doubled single-word names + value inputs
    assert seq[0].startswith("0_scene_scene")
    assert "filter_color_red" in seq[1]
    inputs = t.programToInputs(post, offset=2)
    assert inputs == [[], [2], [3]]
    # key <-> function roundtrip
    fn, arity = t.keyToFunction(seq[1])
    assert fn["function"] == "filter_color"
    assert fn["value_inputs"] == ["red"]
    assert arity == 1
    assert t.keyToArity(seq[1]) == 1


def test_program_translator_tree_reorder():
    # root with two children: postfix order must place children first
    program = [
        {"function": "scene", "value_inputs": [], "inputs": []},
        {"function": "scene", "value_inputs": [], "inputs": []},
        {"function": "equal_size", "value_inputs": [], "inputs": [0, 1]},
    ]
    t = ProgramTranslator(SymbolDict(), 2)
    post = t.programToPostfixProgram(program)
    assert post[-1]["function"] == "equal_size"
    assert post[-1]["inputs"] == [0, 1]


# ------------------------------------------------------------- vectorize

def test_vectorize_2d_padding_and_multiple():
    arr, lens = vectorize_2d([[1, 2], [3, 4, 5]], pad_multiple=4)
    assert arr.shape == (2, 4)
    np.testing.assert_array_equal(lens, [2, 3])
    np.testing.assert_array_equal(arr[0], [1, 2, 0, 0])


def test_vectorize_3d():
    arr, lens = vectorize_3d([[[1], [2, 3]], [[4, 5, 6]]])
    assert arr.shape == (2, 2, 3)
    assert lens[0, 1] == 2 and lens[1, 0] == 3


# ----------------------------------------------------- bucketing / filters

def _make_cfg(tmp_path):
    cfg = Config()
    cfg.dataset = "CLEVR"
    cfg.dataBasedir = str(tmp_path)
    load_dataset_config(cfg)
    cfg.dataPath = str(tmp_path)
    return cfg


def _instances(n=20):
    out = []
    for i in range(n):
        qlen = 3 + (i % 12)
        plen = 2 + (i % 8)
        out.append({
            "question": " ".join(["w"] * qlen),
            "questionSeq": ["w"] * qlen,
            "answer": "yes",
            "imageId": i,
            "programSeq": ["0_scene_scene_"] * plen,
            "programInputs": [[] for _ in range(plen)],
            "index": i,
        })
    return out


def test_bucketing_two_level(tmp_path):
    cfg = _make_cfg(tmp_path)
    cfg.programLims = [4, 8]
    cfg.questionLims = [6, 10]
    p = Preprocesser(cfg)
    buckets = p.bucketData(_instances())
    assert len(buckets) > 1
    # every bucket is homogeneous wrt both separators
    for b in buckets:
        psep = {p.lseparator("programSeq", cfg.programLims)["separate"](x)
                for x in b}
        qsep = {p.lseparator("questionSeq", cfg.questionLims)["separate"](x)
                for x in b}
        assert len(psep) == 1 and len(qsep) == 1
    # no instance lost
    assert sum(len(b) for b in buckets) == 20


def test_filters(tmp_path):
    cfg = _make_cfg(tmp_path)
    cfg.tMaxQ = 6
    p = Preprocesser(cfg)
    p.answerDict.addSeq(["yes"])
    p.answerDict.createVocab()
    data = p.prepareData(_instances(), train=True, filterKey="train")
    total = sum(len(b["indices"]) for b in data)
    assert total == sum(1 for x in _instances() if len(x["questionSeq"]) <= 6)


def test_type_filter(tmp_path):
    cfg = _make_cfg(tmp_path)
    cfg.vFilterOp = 1
    insts = _instances()
    insts[0]["programSeq"][-1] = "1_query_size_"
    p = Preprocesser(cfg)
    p.answerDict.addSeq(["yes"])
    p.answerDict.createVocab()
    data = p.prepareData(insts, train=False, filterKey="val")
    kept = [i for b in data for i in b["indices"]]
    assert 0 not in kept


# ------------------------------------------------------- readers + caching

def test_clevr_reader_caches(tmp_path):
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset(str(tmp_path), n_train=12, n_val=6, n_test=6,
                            dims=(4, 3, 3), h5=False)
    cfg = _make_cfg(tmp_path)
    cfg.dataPath = os.path.join(str(tmp_path), "CLEVR_v1", "data")
    p = Preprocesser(cfg)
    inst = p.readTier("train", train=True)
    assert os.path.exists(cfg.instancesFile("train"))
    assert os.path.exists(cfg.questionDictFile())
    # second read loads from cache with identical result
    p2 = Preprocesser(cfg)
    inst2 = p2.readTier("train", train=True)
    assert inst["instances"] == inst2["instances"]
    assert p2.questionDict.sym2id == p.questionDict.sym2id


def test_cache_writes_are_atomic(tmp_path, monkeypatch):
    """Multi-host preprocessing race (every process runs the Preprocesser
    against the same shared dataset dir): cache files must land via
    temp + os.rename with the instances JSON — the existence gate readers
    check — renamed LAST, so exists(instances) implies complete dict
    pickles, and a writer crash mid-writeFiles leaves a rebuildable (not
    torn) cache."""
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset(str(tmp_path), n_train=12, n_val=6, n_test=6,
                            dims=(4, 3, 3), h5=False)
    cfg = _make_cfg(tmp_path)
    cfg.dataPath = os.path.join(str(tmp_path), "CLEVR_v1", "data")

    renames = []
    real_rename = os.rename

    def recording_rename(src, dst):
        renames.append(dst)
        real_rename(src, dst)

    import mac_network_tpu.data.preprocess as pp_mod
    monkeypatch.setattr(pp_mod.os, "rename", recording_rename)
    Preprocesser(cfg).readTier("train", train=True)
    gate = cfg.instancesFile("train")
    assert gate in renames and renames[-1] == gate
    assert cfg.questionDictFile() in renames[:-1]

    # a crash before the gate rename leaves exists(gate) False -> the next
    # reader REBUILDS instead of loading a torn cache
    for f in renames:
        os.remove(f)

    def crashing_rename(src, dst):
        if dst == gate:
            raise RuntimeError("killed mid-write")
        real_rename(src, dst)

    monkeypatch.setattr(pp_mod.os, "rename", crashing_rename)
    with pytest.raises(RuntimeError):
        Preprocesser(cfg).readTier("train", train=True)
    assert not os.path.exists(gate)
    monkeypatch.setattr(pp_mod.os, "rename", real_rename)
    inst = Preprocesser(cfg).readTier("train", train=True)
    assert inst["instances"]


def test_nlvr_reader(tmp_path):
    cfg = Config()
    cfg.dataset = "NLVR"
    cfg.dataBasedir = str(tmp_path)
    load_dataset_config(cfg)
    os.makedirs(cfg.dataPath, exist_ok=True)
    with open(cfg.datasetFile("train"), "w") as f:
        for i in range(3):
            f.write(json.dumps({"sentence": f"There are {i} boxes.",
                                "label": "true" if i % 2 else "false",
                                "identifier": f"train-{i}"}) + "\n")
    p = Preprocesser(cfg)
    instances = p.readData(cfg.datasetFile("train"),
                           cfg.instancesFile("train"), train=True)
    # each sentence replicated over 6 images (preprocess.py:297-305)
    assert len(instances) == 18
    ids = {x["imageId"] for x in instances}
    assert "train-0-0" in ids and "train-0-5" in ids


def test_embedding_init_shapes(tmp_path):
    cfg = _make_cfg(tmp_path)
    cfg.wrdEmbRandom = True
    cfg.wrdEmbUniform = True
    cfg.wrdEmbDim = 10
    p = Preprocesser(cfg)
    p.questionDict.addSeq(["a", "b", "c"])
    p.questionDict.createVocab()
    emb = p.initializeWordEmbeddings()
    # row 0 (<PAD>) dropped; pinned to zeros in-graph (model.py:217)
    assert emb.shape == (p.questionDict.getNumSymbols() - 1, 10)


def test_glove_overlay(tmp_path):
    cfg = _make_cfg(tmp_path)
    cfg.wrdEmbDim = 3
    cfg.wrdEmbRandom = False
    glove = tmp_path / "glove.txt"
    glove.write_text("red 1.0 2.0 3.0\nblue 4.0 5.0 6.0\n")
    cfg.wordVectorsFile = str(glove)
    p = Preprocesser(cfg)
    p.questionDict.addSeq(["red", "green"])
    p.questionDict.createVocab()
    emb = p.initializeWordEmbeddings(noPadding=True)
    idx = p.questionDict.sym2id["red"]
    np.testing.assert_allclose(emb[idx], [1.0, 2.0, 3.0])


# ---------------------------------------------------------------- loaders

def test_trim_and_pad_batch():
    from mac_network_tpu.data.loader import trim_batch, pad_batch
    batch = {
        "questions": np.arange(40).reshape(4, 10).astype(np.int32),
        "questionLengths": np.array([3, 5, 2, 4], np.int32),
        "answers": np.array([1, 2, 3, 4], np.int32),
        "imageIds": [0, 1, 2, 3],
        "indices": [0, 1, 2, 3],
        "instances": [{}] * 4,
    }
    t = trim_batch(batch, pad_multiple=4)
    assert t["questions"].shape == (4, 8)     # max len 5 -> pad to 8
    p = pad_batch(t, 6)
    assert p["questions"].shape == (6, 8)
    np.testing.assert_array_equal(p["mask"], [1, 1, 1, 1, 0, 0])


def test_image_loader_npy(tmp_path):
    from mac_network_tpu.data.loader import ImageLoader
    feats = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
    np.save(tmp_path / "train.npy", feats)
    cfg = Config()
    loader = ImageLoader({"imagesFilename": str(tmp_path / "train.npy")}, cfg)
    loader.open()
    out = loader.load_batch({"imageIds": [1, 0]})
    assert out.shape == (2, 2, 2, 3)          # CHW -> HWC
    np.testing.assert_array_equal(out[0], feats[1].transpose(1, 2, 0))
    loader.close()


def test_prefetch_error_propagates(tmp_path):
    """A loader failure inside the prefetch thread must surface in the
    consumer, not vanish (the reference's worker swallows exceptions,
    main.py:413-414 'except: pass' — a documented fix)."""
    from mac_network_tpu.data.loader import PrefetchIterator
    cfg = Config()

    class BoomLoader:
        def load_batch(self, batch):
            raise RuntimeError("boom")

    batch = {"questions": np.zeros((2, 4), np.int32),
             "questionLengths": np.ones((2,), np.int32),
             "answers": np.zeros((2,), np.int32),
             "imageIds": [0, 1], "indices": [0, 1], "instances": [{}, {}]}
    it = PrefetchIterator([batch], BoomLoader(), cfg, train=True)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
