"""Stats tracking, console progress, CSV logging and result analysis
(reference: main.py:26-149, 446-517).

The CSV schema matches the reference exactly (header main.py:29-42, record
main.py:45-56, lr as last column) so existing tooling — and our resume
logic (``last_logged_epoch``) — interoperates with reference logs.
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from typing import Dict, Optional

from termcolor import colored

from mac_network_tpu.config import Config


def bold(txt):
    return colored(str(txt), attrs=["bold"])


def bcolored(txt, color):
    return colored(str(txt), color, attrs=["bold"])


def _writeline(f, line):
    f.write(str(line) + "\n")


def _writelist(f, lst):
    _writeline(f, ",".join(map(str, lst)))


# --------------------------------------------------------------------- CSV

def log_init(cfg: Config) -> None:
    """Write the CSV header (reference: main.py:29-42)."""
    with open(cfg.logFile(), "a+") as f:
        _writeline(f, cfg.expName)
        headers = ["epoch", "trainAcc", "valAcc", "trainLoss", "valLoss"]
        if cfg.evalTrain:
            headers += ["evalTrainAcc", "evalTrainLoss"]
        if cfg.extra:
            if cfg.evalTrain:
                headers += ["thAcc", "thLoss"]
            headers += ["vhAcc", "vhLoss"]
        headers += ["time", "lr"]
        _writelist(f, headers)


def log_record(cfg: Config, epoch: int, epoch_time: float, lr: float,
               train_res, eval_res, extra_eval_res) -> None:
    """Append one epoch record (reference: main.py:45-56)."""
    with open(cfg.logFile(), "a+") as f:
        record = [epoch, train_res["acc"], eval_res["val"]["acc"],
                  train_res["loss"], eval_res["val"]["loss"]]
        if cfg.evalTrain:
            record += [eval_res["evalTrain"]["acc"],
                       eval_res["evalTrain"]["loss"]]
        if cfg.extra:
            if cfg.evalTrain:
                record += [extra_eval_res["evalTrain"]["acc"],
                           extra_eval_res["evalTrain"]["loss"]]
            record += [extra_eval_res["val"]["acc"],
                       extra_eval_res["val"]["loss"]]
        record += [epoch_time, lr]
        _writelist(f, record)


def last_logged_epoch(cfg: Config):
    """Read epoch + lr back from the CSV tail for resume
    (reference: main.py:59-64)."""
    with open(cfg.logFile()) as f:
        last = list(f)[-1].split(",")
    return int(last[0]), float(last[-1])


# -------------------------------------------------------------------- stats

def ema_avg(avg: Optional[float], value: float, rate: float = 0.98) -> float:
    return value if avg is None else avg * rate + value * (1 - rate)


def init_stats() -> Dict:
    return {"totalBatches": 0, "totalData": 0, "totalLoss": 0.0,
            "totalCorrect": 0, "loss": 0.0, "acc": 0.0,
            "emaLoss": None, "emaAcc": None}


def update_stats(stats: Dict, res: Dict, batch_size: int) -> Dict:
    stats["totalBatches"] += 1
    stats["totalData"] += batch_size
    stats["totalLoss"] += res["loss"]
    stats["totalCorrect"] += res["correctNum"]
    stats["loss"] = stats["totalLoss"] / stats["totalBatches"]
    stats["acc"] = stats["totalCorrect"] / max(stats["totalData"], 1)
    stats["emaLoss"] = ema_avg(stats["emaLoss"], res["loss"])
    stats["emaAcc"] = ema_avg(stats["emaAcc"], res["acc"])
    return stats


def stats_line(cfg: Config, stats: Dict, res: Dict, epoch: int,
               batch_num: int, data_len: int, start_time: float) -> str:
    """Colored single-line progress with load/train time split
    (reference: main.py:485-517)."""
    return ("\reb {epoch},{b} ({done} / {total:5d}), t = {t} "
            "({load:2.2f}+{train:2.2f}), lr {lr}, l = {loss}, a = {acc}, "
            "avL = {avl}, avA = {ava}, g = {g:2.4f}, "
            "emL = {eml:2.4f}, emA = {ema:2.4f}; {exp}").format(
        epoch=bcolored("{:2d}".format(epoch), "green"),
        b="{:3d}".format(batch_num),
        done=bcolored("{:5d}".format(stats["totalData"]), "green"),
        total=data_len,
        t=bcolored("{:2.2f}".format(time.time() - start_time), "green"),
        load=res.get("readTime", 0.0), train=res.get("trainTime", 0.0),
        lr=bold(cfg.lr),
        loss=bcolored("{:2.4f}".format(res["loss"]), "blue"),
        acc=bcolored("{:2.4f}".format(res["acc"]), "blue"),
        avl=bcolored("{:2.4f}".format(stats["loss"]), "blue"),
        ava=bcolored("{:2.4f}".format(stats["acc"]), "red"),
        g=res.get("gradNorm", -1.0),
        eml=stats["emaLoss"], ema=stats["emaAcc"], exp=cfg.expName)


# ----------------------------------------------------------------- analysis

ANALYSIS_QUESTION_LIMS = [(0, 18), (19, float("inf"))]
ANALYSIS_PROGRAM_LIMS = [(0, 12), (13, float("inf"))]


def _to_arity(instance):
    return instance["programSeq"][-1].split("_", 1)[0]


def _to_type(instance):
    return instance["programSeq"][-1].split("_", 1)[1]


def _field_len_in_range(field):
    return lambda inst, group: group[0] <= len(inst[field]) <= group[1]


def _grouper_key(to_key):
    def grouper(instances):
        res = defaultdict(list)
        for inst in instances:
            res[to_key(inst)].append(inst)
        return res
    return grouper


def _grouper_cond(groups, is_in):
    def grouper(instances):
        return {g: [i for i in instances if is_in(i, g)] for g in groups}
    return grouper


GROUPERS = {
    "questionLength": _grouper_cond(ANALYSIS_QUESTION_LIMS,
                                    _field_len_in_range("questionSeq")),
    "programLength": _grouper_cond(ANALYSIS_PROGRAM_LIMS,
                                   _field_len_in_range("programSeq")),
    "arity": _grouper_key(_to_arity),
    "type": _grouper_key(_to_type),
}


def print_analysis(cfg: Config, res: Dict) -> None:
    """Per-group accuracy breakdown (reference: main.py:112-121)."""
    if not cfg.analysisType:
        return
    print("Analysis by {}".format(cfg.analysisType))
    groups = GROUPERS[cfg.analysisType](res["preds"])
    for key, instances in groups.items():
        num = len(instances)
        acc = (sum(1.0 for i in instances
                   if i.get("prediction") == i.get("answer")) / num
               if num else 0.0)
        print("Group {}: Acc: {:.4f}, Num: {}".format(key, acc, num))


def print_tier_results(name: str, res: Optional[Dict], color: str,
                       cfg: Optional[Config] = None) -> None:
    if res is None:
        return
    print("{name} Loss: {loss}, {name} accuracy: {acc}".format(
        name=name, loss=bcolored(res["loss"], color),
        acc=bcolored(res["acc"], color)))
    if cfg is not None:
        print_analysis(cfg, res)


def print_dataset_results(cfg, train_res, eval_res, extra_eval_res) -> None:
    print_tier_results("Training", train_res, "magenta", cfg)
    print_tier_results("Training EMA", eval_res.get("evalTrain"), "red", cfg)
    print_tier_results("Validation", eval_res.get("val"), "cyan", cfg)
    if extra_eval_res:
        print_tier_results("Extra Training EMA",
                           extra_eval_res.get("evalTrain"), "red", cfg)
        print_tier_results("Extra Validation", extra_eval_res.get("val"),
                           "cyan", cfg)
