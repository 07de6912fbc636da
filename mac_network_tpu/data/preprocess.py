"""Dataset preprocessing (reference: preprocess.py:154-688).

Reads CLEVR / NLVR question files, tokenizes, builds vocabularies, translates
CLEVR functional programs to postfix sequences, filters / subsets / buckets
by program+question length, and vectorizes into padded numpy arrays with
per-bucket static shapes — the shape discipline that keeps XLA from
recompiling (SURVEY.md §7 "static shapes vs bucketing").

JSON/pickle caching matches the reference layout ({tier}Instances.json +
dict pickles, reference: preprocess.py:228-260) so preprocessed artifacts
interoperate.
"""

from __future__ import annotations

import json
import os
import pickle
import random
import time
from typing import Dict, List, Optional

import numpy as np

from mac_network_tpu.config import Config
from mac_network_tpu.data.symbol_dict import SymbolDict
from mac_network_tpu.data.program_translator import ProgramTranslator
from mac_network_tpu import native


def vectorize_2d(items: List[List[int]], min_x: int = 0, min_y: int = 0,
                 dtype=np.int32, pad_multiple: int = 1):
    """Pad a ragged 2-D int list into [N, maxLen] plus lengths
    (reference: preprocess.py:29-37).  ``pad_multiple`` rounds the padded
    length up so trimmed batches quantize to few distinct shapes."""
    max_x = max(len(items), min_x)
    max_y = max([len(item) for item in items] + [min_y])
    if pad_multiple > 1:
        max_y = -(-max_y // pad_multiple) * pad_multiple
    t = np.zeros((max_x, max_y), dtype=dtype)
    lengths = np.zeros((max_x,), dtype=np.int32)
    for i, item in enumerate(items):
        t[i, :len(item)] = np.asarray(item, dtype=dtype)
        lengths[i] = len(item)
    return t, lengths


def vectorize_3d(items, min_x: int = 0, min_y: int = 0, min_z: int = 0,
                 dtype=np.int32):
    """Pad a ragged 3-D int list (reference: preprocess.py:40-50)."""
    max_x = max(len(items), min_x)
    max_y = max([len(i) for i in items] + [min_y])
    max_z = max([len(s) for i in items for s in i] + [min_z])
    t = np.zeros((max_x, max_y, max_z), dtype=dtype)
    lengths = np.zeros((max_x, max_y), dtype=np.int32)
    for i, item in enumerate(items):
        for j, sub in enumerate(item):
            t[i, j, :len(sub)] = np.asarray(sub, dtype=dtype)
            lengths[i, j] = len(sub)
    return t, lengths


ALL_PUNCT = ["?", "!", "\\", "/", ")", "(", ".", ",", ";", ":"]


def tokenize(text: str,
             ignored_puncts=("?", "!", "\\", "/", ")", "("),
             kept_puncts=(".", ",", ";", ":"),
             delim: str = " ") -> List[str]:
    """Rule-based tokenizer (reference: preprocess.py:188-225): kept
    punctuation becomes separate tokens, ignored punctuation is stripped,
    lowercased, split on spaces."""
    for punct in kept_puncts:
        text = text.replace(punct, delim + punct + delim)
    for punct in ignored_puncts:
        text = text.replace(punct, "")
    return [t for t in text.lower().split(delim) if t != ""]


class Preprocesser:
    """End-to-end preprocessing driver (reference Preprocesser,
    preprocess.py:164-688)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.questionDict = SymbolDict()
        self.answerDict = SymbolDict(empty=True)
        self.qaDict = SymbolDict()
        self.programDict = SymbolDict()
        self.programTranslator = ProgramTranslator(self.programDict, 2)

    # ------------------------------------------------------------ file io
    def readFiles(self, instancesFilename: str):
        with open(instancesFilename) as f:
            instances = json.load(f)
        with open(self.cfg.questionDictFile(), "rb") as f:
            self.questionDict = pickle.load(f)
        with open(self.cfg.answerDictFile(), "rb") as f:
            self.answerDict = pickle.load(f)
        with open(self.cfg.qaDictFile(), "rb") as f:
            self.qaDict = pickle.load(f)
        return instances

    def writeFiles(self, instances, instancesFilename: str) -> None:
        """Atomic cache writes: under multi-host training every process
        runs the Preprocesser against the SAME shared dataset dir (the
        reference is single-process, preprocess.py:228-260, so it writes
        in place) — a reader racing a writer must never see a torn pickle.
        Each file lands via temp + os.rename, and the instances JSON (the
        existence gate the readers check) renames LAST, so
        exists(instances) implies the dict pickles are complete.  Losers
        of the race rebuild redundantly but correctly."""
        def atomic(path: str, write, mode: str):
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, mode) as f:
                write(f)
            os.rename(tmp, path)

        atomic(self.cfg.questionDictFile(),
               lambda f: pickle.dump(self.questionDict, f), "wb")
        atomic(self.cfg.answerDictFile(),
               lambda f: pickle.dump(self.answerDict, f), "wb")
        atomic(self.cfg.qaDictFile(),
               lambda f: pickle.dump(self.qaDict, f), "wb")
        atomic(instancesFilename, lambda f: json.dump(instances, f), "w")

    def writePreds(self, res, tier: str, suffix: str = "") -> None:
        """Sorted predictions JSON + one-answer-per-line txt
        (reference: preprocess.py:263-272)."""
        if res is None:
            return
        preds = sorted(res["preds"], key=lambda inst: inst["index"])
        with open(self.cfg.predsFile(tier + suffix), "w") as f:
            f.write(json.dumps(preds))
        with open(self.cfg.answersFile(tier + suffix), "w") as f:
            for inst in preds:
                f.write(str(inst.get("prediction", "")) + "\n")

    # ------------------------------------------------------------ readers
    def readCLEVR(self, datasetFilename: str, instancesFilename: str,
                  train: bool):
        """Parse CLEVR_{tier}_questions.json (reference:
        preprocess.py:318-367): tokenize, translate programs to postfix,
        shuffle, build vocab, cache."""
        cfg = self.cfg
        if os.path.exists(instancesFilename):
            return self.readFiles(instancesFilename)

        with open(datasetFilename) as f:
            data = json.load(f)["questions"]

        # native batch tokenization of the whole tier (C++ host op; falls
        # back to the pure-Python tokenizer with identical output)
        token_lists = native.tokenize_batch(
            [inst["question"] for inst in data])

        instances = []
        for i, instance in enumerate(data):
            question = instance["question"]
            questionSeq = (token_lists[i] if token_lists is not None
                           else tokenize(question))

            if train or (not cfg.wrdEmbUnknown):
                self.questionDict.addSeq(questionSeq)
                self.qaDict.addSeq(questionSeq)

            answer = instance.get("answer", "yes")   # dummy for test tier
            self.answerDict.addSeq([answer])
            self.qaDict.addSeq([answer])

            dummyProgram = [{"function": "FUNC", "value_inputs": [],
                             "inputs": []}]
            program = instance.get("program", dummyProgram)
            postfix = self.programTranslator.programToPostfixProgram(program)
            programSeq = self.programTranslator.programToSeq(postfix)
            programInputs = self.programTranslator.programToInputs(
                postfix, offset=2)

            instances.append({
                "question": question,
                "questionSeq": questionSeq,
                "answer": answer,
                "imageId": instance["image_index"],
                "program": program,
                "programSeq": programSeq,
                "programInputs": programInputs,
                "index": i,
            })

        random.shuffle(instances)
        self.questionDict.createVocab()
        self.answerDict.createVocab()
        self.qaDict.createVocab()
        self.writeFiles(instances, instancesFilename)
        return instances

    def readNLVR(self, datasetFilename: str, instancesFilename: str,
                 train: bool):
        """Parse NLVR jsonl; each sentence pairs with 6 rendered images
        (reference: preprocess.py:275-315)."""
        cfg = self.cfg
        if os.path.exists(instancesFilename):
            return self.readFiles(instancesFilename)

        instances = []
        i = 0
        with open(datasetFilename) as f:
            for line in f:
                instance = json.loads(line)
                question = instance["sentence"]
                questionSeq = tokenize(question, ignored_puncts=ALL_PUNCT,
                                       kept_puncts=())
                if train or (not cfg.wrdEmbUnknown):
                    # parity note: the reference adds the raw sentence
                    # string char-by-char here (preprocess.py:290-291 passes
                    # the un-tokenized string to addSeq); we add the token
                    # sequence, which is the evident intent.
                    self.questionDict.addSeq(questionSeq)
                    self.qaDict.addSeq(questionSeq)
                answer = instance["label"]
                self.answerDict.addSeq([answer])
                self.qaDict.addSeq([answer])
                for k in range(6):
                    instances.append({
                        "question": question,
                        "questionSeq": questionSeq,
                        "answer": answer,
                        "imageId": f"{instance['identifier']}-{k}",
                        "index": i,
                    })
                    i += 1
        random.shuffle(instances)
        self.questionDict.createVocab()
        self.answerDict.createVocab()
        self.qaDict.createVocab()
        self.writeFiles(instances, instancesFilename)
        return instances

    def readGQA(self, datasetFilename: str, instancesFilename: str,
                train: bool):
        """Parse GQA {tier}_questions.json — a DICT of
        {questionId: {question, answer, imageId}} (the reference keeps its
        GQA adaptation on a separate branch, readme.md:13; this follows the
        GQA paper's release format).  Image ids are strings resolved
        through {tier}ImgIds.json, like NLVR."""
        cfg = self.cfg
        if os.path.exists(instancesFilename):
            return self.readFiles(instancesFilename)

        with open(datasetFilename) as f:
            data = json.load(f)

        qids = sorted(data.keys())
        token_lists = native.tokenize_batch(
            [data[q]["question"] for q in qids])

        instances = []
        for i, qid in enumerate(qids):
            instance = data[qid]
            question = instance["question"]
            questionSeq = (token_lists[i] if token_lists is not None
                           else tokenize(question))
            if train or (not cfg.wrdEmbUnknown):
                self.questionDict.addSeq(questionSeq)
                self.qaDict.addSeq(questionSeq)
            answer = str(instance.get("answer", "yes"))
            self.answerDict.addSeq([answer])
            self.qaDict.addSeq([answer])
            instances.append({
                "question": question,
                "questionSeq": questionSeq,
                "answer": answer,
                "imageId": str(instance["imageId"]),
                "questionId": qid,
                "index": i,
            })

        random.shuffle(instances)
        self.questionDict.createVocab()
        self.answerDict.createVocab()
        self.qaDict.createVocab()
        self.writeFiles(instances, instancesFilename)
        return instances

    def readData(self, datasetFilename, instancesFilename, train):
        readers = {"CLEVR": self.readCLEVR, "NLVR": self.readNLVR,
                   "GQA": self.readGQA}
        return readers[self.cfg.dataset](datasetFilename, instancesFilename,
                                         train)

    def readTier(self, tier: str, train: bool):
        """(reference: preprocess.py:385-396)"""
        cfg = self.cfg
        instances = self.readData(cfg.datasetFile(tier),
                                  cfg.instancesFile(tier), train)
        images = {"imagesFilename": cfg.imagesFile(tier)}
        if cfg.dataset in ("NLVR", "GQA"):
            images["imageIdsFilename"] = cfg.imagesIdsFile(tier)
        if cfg.dataset == "GQA" and cfg.gqaFeatures == "objects":
            images["imagesInfoFilename"] = cfg.imagesInfoFile(tier)
        return {"instances": instances, "images": images, "train": train}

    def readDataset(self, suffix: str = "", hasTrain: bool = True):
        """All tiers + evalTrain alias with train=False
        (reference: preprocess.py:402-415)."""
        dataset = {"train": None, "evalTrain": None, "val": None, "test": None}
        if hasTrain:
            dataset["train"] = self.readTier("train" + suffix, train=True)
        dataset["val"] = self.readTier("val" + suffix, train=False)
        dataset["test"] = self.readTier("test" + suffix, train=False)
        if hasTrain:
            dataset["evalTrain"] = dict(dataset["train"])
            dataset["evalTrain"]["train"] = False
        return dataset

    # ------------------------------------------------------- vectorization
    def vectorizeData(self, data):
        """Symbols -> padded int arrays (reference: preprocess.py:418-441)."""
        cfg = self.cfg
        qDict = self.qaDict if cfg.ansEmbMod == "SHARED" else self.questionDict
        encoded = native.encode_batch([d["questionSeq"] for d in data],
                                      qDict.sym2id)
        if encoded is None:
            encoded = [qDict.encodeSequence(d["questionSeq"]) for d in data]
        questions, lengths = vectorize_2d(encoded,
                                          pad_multiple=max(1, cfg.bucketPad))
        answers = np.array(
            [self.answerDict.encodeSym(d["answer"]) for d in data],
            dtype=np.int32)
        return {
            "questions": questions,
            "questionLengths": lengths,
            "answers": answers,
            "imageIds": [d["imageId"] for d in data],
            "indices": [d["index"] for d in data],
            "instances": data,
        }

    # ------------------------------------------------------------ bucketing
    @staticmethod
    def lseparator(key: str, lims: List[int]):
        """Bucket separator by field length (reference:
        preprocess.py:444-452)."""
        maxI = len(lims)

        def separate(x):
            v = x[key]
            for i, lim in enumerate(lims):
                if len(v) < lim:
                    return i
            return maxI

        return {"separate": separate, "groupsNum": maxI + 1}

    @staticmethod
    def bucket(instances, separator):
        buckets = [[] for _ in range(separator["groupsNum"])]
        for inst in instances:
            buckets[separator["separate"](inst)].append(inst)
        return [b for b in buckets if b]

    def rebucket(self, buckets, separator):
        res = []
        for b in buckets:
            res += self.bucket(b, separator)
        return res

    def bucketData(self, data, noBucket: bool = False):
        """Two-level bucketing: by program length, re-split by question
        length (reference: preprocess.py:485-499; limits config.py:434-435)."""
        cfg = self.cfg
        if noBucket or cfg.noBucket:
            return [data]
        questionSep = self.lseparator("questionSeq", cfg.questionLims)
        if cfg.noRebucket or cfg.dataset in ("NLVR", "GQA"):
            # no functional programs -> question-length buckets only
            return self.bucket(data, questionSep)
        programSep = self.lseparator("programSeq", cfg.programLims)
        buckets = self.bucket(data, programSep)
        return self.rebucket(buckets, questionSep)

    # ------------------------------------------------------------ filtering
    def prepareData(self, data, train: bool, filterKey: Optional[str] = None,
                    noBucket: bool = False):
        """Filter -> subset -> bucket -> vectorize
        (reference: preprocess.py:508-560)."""
        cfg = self.cfg
        filterDefault = {"maxQLength": 0, "maxPLength": 0, "onlyChain": False,
                         "filterOp": 0}
        filterTrain = {"maxQLength": cfg.tMaxQ, "maxPLength": cfg.tMaxP,
                       "onlyChain": cfg.tOnlyChain, "filterOp": cfg.tFilterOp}
        filterVal = {"maxQLength": cfg.vMaxQ, "maxPLength": cfg.vMaxP,
                     "onlyChain": cfg.vOnlyChain, "filterOp": cfg.vFilterOp}
        filters = {"train": filterTrain, "evalTrain": filterTrain,
                   "val": filterVal, "test": filterDefault}
        fltr = filters.get(filterKey, filterDefault) if filterKey else filterDefault

        # finetune split on validation (reference: preprocess.py:526-530)
        if cfg.trainExtra and cfg.extraVal and cfg.finetuneNum > 0:
            data = data[:cfg.finetuneNum] if train else data[cfg.finetuneNum:]

        typeFilter = cfg.typeFilters[fltr["filterOp"]]
        if fltr["onlyChain"]:
            data = [d for d in data
                    if all(len(inp) < 2 for inp in d["programInputs"])]
        if fltr["maxQLength"] > 0:
            data = [d for d in data
                    if len(d["questionSeq"]) <= fltr["maxQLength"]]
        if fltr["maxPLength"] > 0:
            data = [d for d in data
                    if len(d["programSeq"]) <= fltr["maxPLength"]]
        if typeFilter:
            data = [d for d in data if d["programSeq"][-1] not in typeFilter]

        num = cfg.trainedNum if train else cfg.testedNum
        if (not train) and (not cfg.retainVal):
            random.shuffle(data)
        if num > 0:
            data = data[:num]
        if train:
            cfg.trainedNum = len(data)
        else:
            cfg.testedNum = len(data)

        buckets = self.bucketData(data, noBucket=noBucket)
        return [self.vectorizeData(b) for b in buckets]

    def prepareDataset(self, dataset, noBucket: bool = False):
        if dataset is None:
            return None
        for tier in dataset:
            if dataset[tier] is not None:
                dataset[tier]["data"] = self.prepareData(
                    dataset[tier]["instances"], train=dataset[tier]["train"],
                    filterKey=tier, noBucket=noBucket)
        for tier in dataset:
            if dataset[tier] is not None:
                del dataset[tier]["instances"]
        return dataset

    # ------------------------------------------------------- embeddings init
    def initializeWordEmbeddings(self, wordsDict=None, noPadding: bool = False):
        """Random uniform/normal scaled init, optionally overlaid with GloVe
        vectors (reference: preprocess.py:579-619).  Returns the embedding
        matrix *without* row 0 unless noPadding — the <PAD> row is pinned to
        a fixed zero vector in-graph (model parity, model.py:217)."""
        cfg = self.cfg
        if wordsDict is None:
            wordsDict = self.questionDict

        n = wordsDict.getNumSymbols()
        if cfg.wrdEmbUniform:
            embeddings = np.random.uniform(
                -cfg.wrdEmbScale, cfg.wrdEmbScale, size=(n, cfg.wrdEmbDim))
        else:
            embeddings = cfg.wrdEmbScale * np.random.randn(n, cfg.wrdEmbDim)

        if not cfg.wrdEmbRandom:
            with open(cfg.wordVectorsFile) as f:
                for line in f:
                    parts = line.strip().split()
                    word = parts[0].lower()
                    index = wordsDict.sym2id.get(word)
                    if index is not None:
                        embeddings[index] = [float(x) for x in parts[1:]]

        embeddings = embeddings.astype(np.float32)
        if noPadding:
            return embeddings
        return embeddings[1:]

    def initializeQAEmbeddings(self):
        """(reference: preprocess.py:626-639)"""
        cfg = self.cfg
        if cfg.ansEmbMod == "SHARED":
            qa = self.initializeWordEmbeddings(self.qaDict)
            ansMap = np.array([self.qaDict.sym2id[s]
                               for s in self.answerDict.id2sym], dtype=np.int32)
            return {"qa": qa, "ansMap": ansMap}
        q = self.initializeWordEmbeddings(self.questionDict)
        a = None
        if cfg.ansEmbMod == "BOTH":
            a = self.initializeWordEmbeddings(self.answerDict, noPadding=True)
        return {"q": q, "a": a}

    # ------------------------------------------------------------- top level
    def preprocessData(self, verbose: bool = True):
        """Full pipeline (reference: preprocess.py:650-688)."""
        cfg = self.cfg
        start = time.time()
        mainDataset = self.readDataset(hasTrain=True)

        extraDataset = None
        if cfg.extra:
            extraDataset = self.readDataset(suffix="H",
                                            hasTrain=(not cfg.extraVal))
            if not cfg.extraVal:
                for tier in extraDataset:
                    if extraDataset[tier] is not None and mainDataset[tier]:
                        extraDataset[tier]["images"] = mainDataset[tier]["images"]

        embeddings = self.initializeQAEmbeddings()

        mainDataset = self.prepareDataset(mainDataset)
        extraDataset = self.prepareDataset(
            extraDataset,
            noBucket=(not cfg.extraVal) or (not cfg.alterExtra))

        data = {"main": mainDataset, "extra": extraDataset}
        cfg.questionWordsNum = (self.qaDict if cfg.ansEmbMod == "SHARED"
                                else self.questionDict).getNumSymbols()
        cfg.answerWordsNum = self.answerDict.getNumSymbols()
        if verbose:
            print("preprocessed in {:.2f}s: {} question words, {} answers".format(
                time.time() - start, cfg.questionWordsNum, cfg.answerWordsNum))
        return data, embeddings, self.answerDict
