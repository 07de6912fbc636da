"""Typed configuration system.

Mirrors the full flag surface of the reference (reference: config.py:95-424,
~150 flags, same names and defaults) but replaces the global mutable
``Config`` singleton (reference: config.py:92) with an explicit dataclass
that is created by ``parse_args`` and passed around.  Argument files are
supported with the same ``@configs/args.txt`` syntax
(reference: config.py:96 ``fromfile_prefix_chars="@"``), and abbreviated
flags such as ``--clip`` resolve by unambiguous prefix exactly as argparse
does in the reference (``--clip`` -> ``--clipGradients``,
reference: config.py:190).

Runtime-derived values (vocab sizes, dataset sizes, current lr) are carried
on the same object for pragmatic parity with the reference's behavior
(reference: preprocess.py:685-686, main.py:761), but all *model-shaping*
fields are fixed after ``parse_args`` + ``load_dataset_config``.

TPU-specific extensions (all new flags, absent in the reference) are grouped
at the bottom: compute dtype, mesh shape, scan-vs-unroll, Pallas toggles and
host-prefetch depth.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


# Question-type filter groups (reference: config.py:7-14).
TYPE_FILTERS: List[List[str]] = [
    [],
    ["1_query_size_", "1_query_material_", "2_equal_color_", "2_equal_shape_"],
    ["1_query_color_", "1_query_shape_", "2_equal_size_", "2_equal_material_"],
]


@dataclass
class Config:
    # ---------------- systems (reference: config.py:101-112) ----------------
    gpus: str = ""                  # retained name; selects visible accelerators
    gpusNum: int = 1                # number of data-parallel devices
    allowGrowth: bool = False
    maxMemory: float = 1.0
    parallel: bool = False          # async host-side image prefetch
    workers: int = 1
    taskSize: int = 8
    useCPU: bool = False

    # ------------- weight loading / ckpt (reference: config.py:115-123) -----
    restore: bool = False
    restoreEpoch: int = 0
    weightsToKeep: int = 2
    saveEvery: int = 3000
    calleEvery: int = 1500
    saveSubset: bool = False
    trainSubset: bool = False
    varSubset: List[str] = field(default_factory=list)

    # ------------------- experiment / data files (config.py:129-135) --------
    expName: str = "experiment"
    dataset: str = "CLEVR"          # choices: CLEVR, NLVR, GQA
    dataBasedir: str = "./"
    generatedPrefix: str = "gennew"
    featureType: str = "norm_128x32"

    # ------------------- train / eval modes (config.py:141-152) -------------
    train: bool = False
    evalTrain: bool = False
    test: bool = False
    finalTest: bool = False
    retainVal: bool = False
    getPreds: bool = False
    getAtt: bool = False
    analysisType: str = ""
    trainedNum: int = 0
    testedNum: int = 0

    # ------------------- bucketing / filtering (config.py:155-166) ----------
    noBucket: bool = False
    noRebucket: bool = False
    tOnlyChain: bool = False
    vOnlyChain: bool = False
    tMaxQ: int = 0
    tMaxP: int = 0
    vMaxQ: int = 0
    vMaxP: int = 0
    tFilterOp: int = 0
    vFilterOp: int = 0

    # ------------------- extra data (config.py:169-174) ---------------------
    extra: bool = False
    trainExtra: bool = False
    alterExtra: bool = False
    alterNum: int = 1
    extraVal: bool = False
    finetuneNum: int = 0

    # ------------------- EMA (config.py:177-178) ----------------------------
    useEMA: bool = False
    emaDecayRate: float = 0.999

    # ------------------- optimizer (config.py:181-191) ----------------------
    batchSize: int = 64
    epochs: int = 100
    lr: float = 0.0001
    lrReduce: bool = False
    lrDecayRate: float = 0.5
    earlyStopping: int = 0
    adam: bool = False              # flag exists; reference always uses Adam
    l2: float = 0.0
    clipGradients: bool = False
    gradMaxNorm: float = 8.0

    # ------------------- batch norm (config.py:194-199) ---------------------
    memoryBN: bool = False
    stemBN: bool = False
    outputBN: bool = False
    bnDecay: float = 0.999
    bnCenter: bool = False
    bnScale: bool = False

    # ------------------- dropouts, keep-prob style (config.py:202-217) ------
    encInputDropout: float = 0.85
    encStateDropout: float = 1.0
    stemDropout: float = 0.82
    qDropout: float = 0.92
    memoryDropout: float = 0.85
    readDropout: float = 0.85
    writeDropout: float = 1.0
    outputDropout: float = 0.85
    parametricDropout: bool = False
    encVariationalDropout: bool = False
    memoryVariationalDropout: bool = False

    # ------------------- nonlinearities (config.py:220-225) -----------------
    relu: str = "STD"               # STD | PRM | ELU | LKY | SELU
    reluAlpha: float = 0.2          # used by LKY (reference: ops.py:175)
    mulBias: float = 0.0
    imageLinPool: int = 2

    # ------------------- baselines (config.py:229-237) ----------------------
    useBaseline: bool = False
    baselineLSTM: bool = False
    baselineCNN: bool = False
    baselineAtt: bool = False
    baselineProjDim: int = 64
    baselineAttNumLayers: int = 2
    baselineAttType: str = "ADD"    # MUL | DIAG | BL | ADD

    # ------------------- stem (config.py:241-259) ---------------------------
    stemDim: int = 512
    stemNumLayers: int = 2
    stemKernelSize: int = 3
    stemKernelSizes: Optional[List[int]] = None
    stemStrideSizes: Optional[List[int]] = None
    stemLinear: bool = False
    stemGridRnn: bool = False
    stemGridRnnMod: str = "RNN"     # RNN | GRU
    stemGridAct: str = "NON"        # NON | RELU | TANH
    locationAware: bool = False
    locationType: str = "L"         # L | PE
    locationBias: float = 1.0
    locationDim: int = 32

    # ------------------- encoder (config.py:262-281) ------------------------
    encType: str = "LSTM"           # RNN | GRU | LSTM | MiGRU | MiLSTM
    encDim: int = 512
    encNumLayers: int = 1
    encBi: bool = False
    encProj: bool = False
    encProjQAct: str = "NON"        # NON | RELU | TANH
    wrdEmbDim: int = 300
    wrdEmbRandom: bool = False
    wrdEmbUniform: bool = False
    wrdEmbScale: float = 1.0
    wrdEmbFixed: bool = False
    wrdEmbUnknown: bool = False
    ansEmbMod: str = "NON"          # NON | SHARED | BOTH
    answerMod: str = "NON"          # NON | MUL | DIAG | BL

    # ------------------- output unit (config.py:284-288) --------------------
    outClassifierDims: List[int] = field(default_factory=lambda: [512])
    outImage: bool = False
    outImageDim: int = 1024
    outQuestion: bool = False
    outQuestionMul: bool = False

    # ------------------- network shape (config.py:292-303) ------------------
    netLength: int = 16
    memDim: int = 512
    ctrlDim: int = 512
    attDim: int = 512
    unsharedCells: bool = False
    initCtrl: str = "PRM"           # PRM | ZERO | Q
    initMem: str = "PRM"            # PRM | ZERO | Q
    initKBwithQ: str = "NON"        # NON | CNCT | MUL
    addNullWord: bool = False

    # ------------------- control unit (config.py:307-327) -------------------
    controlWholeQ: bool = False
    controlContinuous: bool = False
    controlContextual: bool = False
    controlInWordsProj: bool = False
    controlOutWordsProj: bool = False
    controlInputUnshared: bool = False
    controlInputAct: str = "TANH"   # NON | RELU | TANH
    controlFeedPrev: bool = False
    controlFeedPrevAtt: bool = False
    controlFeedInputs: bool = False
    controlContAct: str = "NON"     # NON | RELU | TANH
    controlConcatWords: bool = False
    controlProj: bool = False
    controlProjAct: str = "NON"     # NON | RELU | TANH

    # ------------------- read unit (config.py:344-362) ----------------------
    readProjInputs: bool = False
    readProjShared: bool = False
    readMemAttType: str = "MUL"     # MUL | DIAG | BL | ADD
    readMemConcatKB: bool = False
    readMemConcatProj: bool = False
    readMemProj: bool = False
    readMemAct: str = "RELU"        # NON | RELU | TANH
    readCtrl: bool = False
    readCtrlAttType: str = "MUL"    # MUL | DIAG | BL | ADD
    readCtrlConcatKB: bool = False
    readCtrlConcatProj: bool = False
    readCtrlConcatInter: bool = False
    readCtrlAct: str = "RELU"       # NON | RELU | TANH
    readSmryKBProj: bool = False

    # ------------------- write unit (config.py:369-387) ---------------------
    writeInputs: str = "BOTH"       # MEM | INFO | BOTH | SUM
    writeConcatMul: bool = False
    writeInfoProj: bool = False
    writeInfoAct: str = "NON"       # NON | RELU | TANH
    writeSelfAtt: bool = False
    writeSelfAttMod: str = "NON"    # NON | CONT
    writeMergeCtrl: bool = False
    writeMemProj: bool = False
    writeMemAct: str = "NON"        # NON | RELU | TANH
    writeGate: bool = False
    writeGateShared: bool = False
    writeGateBias: float = 1.0

    # --------- memory->control auto-encoder loss (reference flags are
    # commented out, config.py:401-406; cell code mac_cell.py:377-405) -----
    autoEncMem: bool = False
    autoEncMemW: float = 0.0001
    autoEncMemInputs: str = "INFO"  # MEM | INFO
    autoEncMemAct: str = "NON"      # NON | RELU | TANH
    autoEncMemLoss: str = "CONT"    # CONT | PROB | SMRY
    autoEncMemCnct: bool = False

    # =============== TPU-native extensions (new in this framework) ==========
    computeDtype: str = "float32"   # float32 | bfloat16 — activation dtype
    prngImpl: str = "rbg"           # rbg | threefry — dropout-mask PRNG.
                                    # rbg lowers to the TPU hardware bit
                                    # generator; threefry is software (the
                                    # per-step dropout masks and their
                                    # in-backward rematerialization then
                                    # cost ~40% of the train step)
    useScan: bool = False           # lax.scan over reasoning steps (else unroll)
    readVariationalDropout: bool = False
                                    # tie the read unit's KB dropout mask
                                    # across reasoning steps (the reference
                                    # draws a fresh mask per step,
                                    # mac_cell.py:219-240 via ops.linear).
                                    # A tied mask — the same treatment the
                                    # reference gives memory dropout with
                                    # memoryVariationalDropout — lets the
                                    # KB projections hoist out of the
                                    # recurrence during TRAINING too,
                                    # cutting ~1/3 of train-step FLOPs.
    usePallas: bool = False         # fused Pallas MAC-step kernel on TPU
                                    # (forces servingEngine=pallas)
    servingEngine: str = "auto"     # serve.py path: auto picks the fused
                                    # Pallas engine in its measured
                                    # winning regime (batchSize <=
                                    # SMALL_BATCH_CROSSOVER, where the
                                    # recurrence is HBM-bound and the
                                    # engine's 3.3x-lower traffic pays;
                                    # BENCH_r03 serve_sweep) and the XLA
                                    # path at large batch (MXU-bound,
                                    # where XLA runs at matmul roofline)
    requestsPerDispatch: int = 8    # serve.py: when the request queue is
                                    # >= this many batches deep, stack K
                                    # batches into ONE jitted lax.scan
                                    # dispatch (the serving analogue of
                                    # --stepsPerDispatch) — at B<=8 the
                                    # step is dispatch-bound (~0.9 ms
                                    # fixed overhead vs ~0.2 ms compute,
                                    # BENCH_r03 serve_sweep), so K-deep
                                    # dispatch amortizes the overhead
                                    # K-fold.  1 disables.
    servingProbe: bool = True       # serve.py engine=auto: time both
                                    # engines for a few iterations at the
                                    # requested batch shape (one-shot,
                                    # cached per device kind + shape under
                                    # ~/.cache/mac_tpu_xla) instead of
                                    # trusting the v5e-measured static
                                    # crossover constant
    fusedTrain: bool = False        # custom-VJP fused TRAINING recurrence
                                    # (ops/pallas/mac_train.py): keeps the
                                    # read chain in VMEM through fwd+bwd.
                                    # Covers BOTH KB-dropout semantics
                                    # (step-tied masks and the reference's
                                    # fresh per-step masks); in-kernel
                                    # dropout uses its own RNG stream
                                    # (same keep-probs, different sample —
                                    # the --prngImpl stance, PARITY.md).
                                    # Partitions over the mesh data axis
                                    # via shard_map (no KB all-gather;
                                    # asserted on compiled HLO)
    fusedTrainProbe: bool = True    # --fusedTrain on a TPU: time one
                                    # optimizer step through the fused and
                                    # XLA engines at the run's batch shape
                                    # and use the winner (one-shot, cached
                                    # under ~/.cache/mac_tpu_xla — at some
                                    # operating points, e.g. GQA 100x2048,
                                    # XLA wins).  false = always fused
    stepsPerDispatch: int = 1       # K optimizer steps per device dispatch
                                    # (lax.scan over K staged batches) —
                                    # amortizes per-step host dispatch
                                    # latency; numerically identical to K
                                    # single steps up to XLA fusion-order
                                    # rounding (train/steps.py).
                                    # Single-host training only
    meshData: int = 0               # data-parallel mesh axis size (0 = all devices)
    meshModel: int = 1              # model-parallel mesh axis (vocab-dim sharding)
    prefetchDepth: int = 2          # device_put double-buffer depth
    hbmData: str = "auto"           # auto | on | off — cache a tier's whole
                                    # feature table in device HBM (one
                                    # sequential upload, then per-batch image
                                    # assembly is an on-device gather fed by a
                                    # ~1KB index vector instead of a ~100MB
                                    # feature upload).  'auto' enables it per
                                    # tier when the table fits the remaining
                                    # hbmDataGB budget.  Single-host only.
    hbmDataGB: float = 8.0          # total HBM budget for cached feature
                                    # tables (v5e has 16GB; leave headroom
                                    # for params/optimizer/activations)
    bucketPad: int = 8              # quantize trimmed question lengths to this
                                    # multiple (static shapes under jit;
                                    # reference trims exactly: main.py:263-270)
    profile: bool = False           # capture a jax.profiler trace per epoch
    seed: int = 0                   # global PRNG seed (data + params + dropout)
    # multi-host (jax.distributed over ICI/DCN; parallel/multihost.py)
    coordinatorAddress: str = ""    # coordinator ip:port ("" = env or single)
    processCount: int = 0           # number of host processes (0/1 = single)
    processIndex: int = -1          # this process's id (-1 = from env)

    # =============== runtime-derived (set by data pipeline) =================
    questionWordsNum: int = 0       # set by preprocessing (preprocess.py:685)
    answerWordsNum: int = 0         # set by preprocessing (preprocess.py:686)

    # dataset-config-derived (load_dataset_config; reference config.py:428-466)
    dataPath: str = ""
    datasetFilename: str = ""
    imagesFilename: str = "{tier}.h5"
    imgIdsFilename: str = "{tier}ImgIds.json"
    imgInfoFilename: str = "{tier}ImgInfo.json"
    gqaFeatures: str = "objects"    # GQA: objects | spatial (branch supports
                                    # both; spatial = CLEVR-like CHW grid)
    gqaObjectsNum: int = 100        # GQA: detector objects per image
    gqaObjectDim: int = 2048        # GQA: object feature dimension
    gqaSpatialDims: List[int] = field(
        default_factory=lambda: [7, 7, 2048])  # GQA spatial feature grid
    wordVectorsFile: str = ""
    imageDims: List[int] = field(default_factory=lambda: [14, 14, 1024])
    programLims: List[int] = field(default_factory=lambda: [5, 10, 15, 20])
    questionLims: List[int] = field(default_factory=lambda: [10, 15, 20, 25])

    # fixed file-name templates (reference: config.py:22-47)
    instancesFilename: str = "{tier}Instances.json"
    questionDictFilename: str = "questionDict.pkl"
    answerDictFilename: str = "answerDict.pkl"
    qaDictFilename: str = "qaDict.pkl"
    expPathname: str = "{expName}"
    weightsPath: str = "./weights"
    predsPath: str = "./preds"
    predsFilename: str = "{tier}Predictions-{expName}.json"
    answersFilename: str = "{tier}Answers-{expName}.txt"
    logPath: str = "./results"
    logFilename: str = "results-{expName}.csv"
    configPath: str = "./results"
    configFilename: str = "config-{expName}.json"

    typeFilters: List[List[str]] = field(default_factory=lambda: [list(g) for g in TYPE_FILTERS])

    # ---------------- path builders (reference: config.py:59-88) ------------
    def dataFile(self, filename: str) -> str:
        return os.path.join(self.dataPath, filename)

    def generatedFile(self, filename: str) -> str:
        return self.dataFile(self.generatedPrefix + filename)

    def datasetFile(self, tier: str) -> str:
        return self.dataFile(self.datasetFilename.format(tier=tier))

    def imagesFile(self, tier: str) -> str:
        return self.dataFile(self.imagesFilename.format(tier=tier))

    def imagesIdsFile(self, tier: str) -> str:
        return self.dataFile(self.imgIdsFilename.format(tier=tier))

    def imagesInfoFile(self, tier: str) -> str:
        """GQA: per-image valid-object counts ({imageId: objectsNum})."""
        return self.dataFile(self.imgInfoFilename.format(tier=tier))

    def instancesFile(self, tier: str) -> str:
        return self.generatedFile(self.instancesFilename.format(tier=tier))

    def questionDictFile(self) -> str:
        return self.generatedFile(self.questionDictFilename)

    def answerDictFile(self) -> str:
        return self.generatedFile(self.answerDictFilename)

    def qaDictFile(self) -> str:
        return self.generatedFile(self.qaDictFilename)

    def expPath(self) -> str:
        return self.expPathname.format(expName=self.expName)

    def _makedirs(self, directory: str) -> str:
        directory = os.path.join(directory, self.expPath())
        os.makedirs(directory, exist_ok=True)
        return directory

    def weightsDir(self) -> str:
        return self._makedirs(self.weightsPath)

    def predsDir(self) -> str:
        return self._makedirs(self.predsPath)

    def logDir(self) -> str:
        return self._makedirs(self.logPath)

    def configDir(self) -> str:
        return self._makedirs(self.configPath)

    def weightsFile(self, epoch) -> str:
        # A directory per epoch (orbax checkpoint dir), vs ckpt file in the
        # reference (config.py:84).
        return os.path.join(self.weightsDir(), "weights{}".format(epoch))

    def predsFile(self, tier: str) -> str:
        return os.path.join(
            self.predsDir(), self.predsFilename.format(tier=tier, expName=self.expName))

    def answersFile(self, tier: str) -> str:
        return os.path.join(
            self.predsDir(), self.answersFilename.format(tier=tier, expName=self.expName))

    def logFile(self) -> str:
        return os.path.join(self.logDir(), self.logFilename.format(expName=self.expName))

    def configFile(self) -> str:
        return os.path.join(self.configDir(), self.configFilename.format(expName=self.expName))

    # ------------------------------------------------------------------ misc
    def dumpJson(self, path: Optional[str] = None) -> None:
        """Config snapshot, like the reference's json.dump(vars(config))
        (reference: main.py:652-653).  Deviation: the reference opens the
        snapshot in append mode (main.py:652 "a+"), so a second run of the
        same experiment produces concatenated, unparseable JSON; the
        snapshot exists for reproducibility, so it is overwritten here."""
        path = path or self.configFile()
        with open(path, "w") as f:
            json.dump({k: v for k, v in dataclasses.asdict(self).items()}, f)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# argparse front-end
# --------------------------------------------------------------------------

_CHOICES = {
    "dataset": ["CLEVR", "NLVR", "GQA"],
    "gqaFeatures": ["objects", "spatial"],
    "servingEngine": ["auto", "xla", "pallas"],
    # Deviation from the reference: its choices list contains the broken
    # single string "questionLength, programLength" (reference:
    # config.py:149), making those two groupers unreachable from the CLI.
    # Here each implemented grouper (train/logging.py GROUPERS) is a choice.
    "analysisType": ["", "questionLength", "programLength", "type", "arity"],
    "relu": ["STD", "PRM", "ELU", "LKY", "SELU"],
    "baselineAttType": ["MUL", "DIAG", "BL", "ADD"],
    "stemGridRnnMod": ["RNN", "GRU"],
    "stemGridAct": ["NON", "RELU", "TANH"],
    "locationType": ["L", "PE"],
    "encType": ["RNN", "GRU", "LSTM", "MiGRU", "MiLSTM"],
    "encProjQAct": ["NON", "RELU", "TANH"],
    "ansEmbMod": ["NON", "SHARED", "BOTH"],
    "answerMod": ["NON", "MUL", "DIAG", "BL"],
    "initCtrl": ["PRM", "ZERO", "Q"],
    "initMem": ["PRM", "ZERO", "Q"],
    "initKBwithQ": ["NON", "CNCT", "MUL"],
    "controlInputAct": ["NON", "RELU", "TANH"],
    "controlContAct": ["NON", "RELU", "TANH"],
    "controlProjAct": ["NON", "RELU", "TANH"],
    "readMemAttType": ["MUL", "DIAG", "BL", "ADD"],
    "readMemAct": ["NON", "RELU", "TANH"],
    "readCtrlAttType": ["MUL", "DIAG", "BL", "ADD"],
    "readCtrlAct": ["NON", "RELU", "TANH"],
    "writeInputs": ["MEM", "INFO", "BOTH", "SUM"],
    "writeInfoAct": ["NON", "RELU", "TANH"],
    "writeSelfAttMod": ["NON", "CONT"],
    "writeMemAct": ["NON", "RELU", "TANH"],
    "autoEncMemInputs": ["MEM", "INFO"],
    "autoEncMemAct": ["NON", "RELU", "TANH"],
    "autoEncMemLoss": ["CONT", "PROB", "SMRY"],
    "computeDtype": ["float32", "bfloat16"],
    "prngImpl": ["rbg", "threefry"],
    "hbmData": ["auto", "on", "off"],
}


def apply_prng_impl(cfg) -> None:
    """Set JAX's global PRNG implementation from --prngImpl.  Must run
    before the first jax.random key is created (CLI entry points call it
    right after parse_args)."""
    import jax
    impl = {"threefry": "threefry2x32"}.get(cfg.prngImpl, cfg.prngImpl)
    jax.config.update("jax_default_prng_impl", impl)

# Fields that are runtime/derived state, not CLI flags.
_NON_FLAGS = {
    "questionWordsNum", "answerWordsNum", "dataPath", "datasetFilename",
    "imagesFilename", "imgIdsFilename", "wordVectorsFile", "imageDims",
    "programLims", "questionLims", "instancesFilename",
    "questionDictFilename", "answerDictFilename", "qaDictFilename",
    "expPathname", "weightsPath", "predsPath", "predsFilename",
    "answersFilename", "logPath", "logFilename", "configPath",
    "configFilename", "typeFilters",
}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        fromfile_prefix_chars="@",
        description="mac_network_tpu — TPU-native MAC network framework")
    defaults = Config()
    for f in dataclasses.fields(Config):
        if f.name in _NON_FLAGS:
            continue
        default = getattr(defaults, f.name)
        flag = "--" + f.name
        kwargs = {}
        if f.name == "restore":
            # reference: config.py:115 ("-r", "--restore")
            if isinstance(default, bool):
                parser.add_argument("-r", flag, action="store_true")
                continue
        if isinstance(default, bool):
            parser.add_argument(flag, action="store_true" if not default
                                else "store_false")
        elif isinstance(default, list) or (
                f.name in ("stemKernelSizes", "stemStrideSizes")):
            elem = str if f.name == "varSubset" else int
            parser.add_argument(flag, default=default, nargs="*", type=elem)
        else:
            typ = type(default)
            kwargs = {"default": default, "type": typ}
            if f.name in _CHOICES:
                kwargs["choices"] = _CHOICES[f.name]
            parser.add_argument(flag, **kwargs)
    return parser


def parse_args(argv: Optional[List[str]] = None) -> Config:
    """Parse CLI args (supporting ``@file`` expansion) into a Config."""
    parser = build_parser()
    ns = parser.parse_args(argv)
    cfg = Config()
    for k, v in vars(ns).items():
        setattr(cfg, k, v)
    return cfg


# --------------------------------------------------------------------------
# dataset-specific config (reference: config.py:428-472)
# --------------------------------------------------------------------------

def config_clevr(cfg: Config) -> Config:
    """CLEVR paths and dims (reference: config.py:428-435)."""
    cfg.dataPath = os.path.join(cfg.dataBasedir, "CLEVR_v1", "data")
    cfg.datasetFilename = "CLEVR_{tier}_questions.json"
    cfg.wordVectorsFile = "./CLEVR_v1/data/glove/glove.6B.{dim}d.txt".format(
        dim=cfg.wrdEmbDim)
    cfg.imageDims = [14, 14, 1024]
    cfg.programLims = [5, 10, 15, 20]
    cfg.questionLims = [10, 15, 20, 25]
    return cfg


def config_nlvr(cfg: Config) -> Config:
    """NLVR paths and feature-type-derived dims (reference: config.py:437-466)."""
    cfg.dataPath = os.path.join(cfg.dataBasedir, "nlvr")
    cfg.datasetFilename = "{tier}.json"
    cfg.imagesFilename = "{{tier}}_{featureType}.h5".format(
        featureType=cfg.featureType)
    cfg.imgIdsFilename = "{tier}ImgIds.json"
    cfg.wordVectorsFile = "./CLEVR_v1/data/glove/glove.6B.{dim}d.txt".format(
        dim=cfg.wrdEmbDim)
    cfg.questionLims = [12]
    if cfg.featureType == "resnet101_512x128":
        cfg.imageDims = [8, 32, 1024]
    else:
        strides_overall = 1
        if cfg.stemStrideSizes is not None:
            for s in cfg.stemStrideSizes:
                strides_overall *= int(s)
        size = cfg.featureType.split("_")[-1].split("x")
        cfg.imageDims = [int(size[1]) // strides_overall,
                         int(size[0]) // strides_overall, 3]
    return cfg


def config_gqa(cfg: Config) -> Config:
    """GQA paths and object-feature dims.  The reference keeps its GQA
    adaptation on a separate branch (reference: readme.md:13, not vendored
    here); this follows the GQA paper's standard setup — per-image OBJECT
    features [objectsNum, objectDim] from a detector, attended by the read
    unit with per-example valid-object masking (batch key
    ``imageObjectsNum`` -> model kwarg ``kb_lengths``).  Features enter the
    model as a [1, objectsNum, objectDim] grid, so set a pointwise stem
    (--stemNumLayers 1, kernel 1) to avoid smearing neighboring objects."""
    cfg.dataPath = os.path.join(cfg.dataBasedir, "gqa")
    cfg.datasetFilename = "{tier}_questions.json"
    cfg.imgIdsFilename = "{tier}ImgIds.json"
    cfg.wordVectorsFile = "./CLEVR_v1/data/glove/glove.6B.{dim}d.txt".format(
        dim=cfg.wrdEmbDim)
    cfg.questionLims = [12, 18, 25]
    if cfg.gqaFeatures == "spatial":
        # CNN spatial grid (CHW in the h5, like CLEVR): no object masks,
        # the regular conv stem applies
        cfg.imagesFilename = "{tier}_spatial.h5"
        cfg.imageDims = list(cfg.gqaSpatialDims)
        return cfg
    cfg.imagesFilename = "{tier}_objects.h5"
    cfg.imgInfoFilename = "{tier}ImgInfo.json"
    cfg.imageDims = [1, cfg.gqaObjectsNum, cfg.gqaObjectDim]
    # objects are an unordered set: force the pointwise stem (a k-wide
    # conv would smear neighboring/padded slots before the kb_lengths
    # mask applies); stemKernelSizes (the explicit list) still overrides
    cfg.stemNumLayers = 1
    cfg.stemKernelSize = 1
    return cfg


LOAD_DATASET_CONFIG = {
    "CLEVR": config_clevr,
    "NLVR": config_nlvr,
    "GQA": config_gqa,
}


def load_dataset_config(cfg: Config) -> Config:
    return LOAD_DATASET_CONFIG[cfg.dataset](cfg)
