"""Attention visualization CLI (reference: visualization.py).

Reads the predictions JSON written by the driver ({tier}Predictions-{exp}
.json with nested per-step attention maps) and renders, per instance:
  * each reasoning step's KB attention bicubically upsampled over the
    original image with a transparency colormap (reference:
    visualization.py:111-144),
  * a steps-x-words heatmap of the question attention
    (visualization.py:146-181),
  * optional self-attention table and gate-value printout
    (visualization.py:209-227).

Instances can be filtered by correctness, question length or a field value
(visualization.py:89-109).

Usage: python visualization.py --expName <exp> --tier val [--sa --gate ...]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.colors import LinearSegmentedColormap  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="val",
                   choices=["train", "val", "test", "evalTrain"])
    p.add_argument("--expName", default="experiment", type=str)
    p.add_argument("--imagesDir", default=None, type=str,
                   help="directory of raw CLEVR pngs (default "
                        "./CLEVR_v1/images/{tier})")
    p.add_argument("--predsDir", default="./preds", type=str)
    p.add_argument("--cmap", default="custom", type=str)
    p.add_argument("--trans", action="store_true",
                   help="transpose question-attention table")
    p.add_argument("--sa", action="store_true",
                   help="also render write-unit self-attention")
    p.add_argument("--gate", action="store_true",
                   help="print write-gate values")
    p.add_argument("--instances", nargs="*", type=int)
    p.add_argument("--maxNum", default=0, type=int)
    p.add_argument("--filter", default=[], nargs="*",
                   choices=["mod", "length", "field"])
    p.add_argument("--filterMod", action="store_true")
    p.add_argument("--filterLength", type=int)
    p.add_argument("--filterField", type=str)
    p.add_argument("--filterIn", action="store_true")
    p.add_argument("--filterList", nargs="*")
    p.add_argument("--imageDims", nargs=2, type=int, default=[14, 14])
    p.add_argument("--dataset", default="CLEVR",
                   choices=["CLEVR", "NLVR", "GQA"],
                   help="picks the input-image naming scheme (CLEVR "
                        "composes CLEVR_{tier}_{id:06d}.png; NLVR/GQA use "
                        "the id verbatim — real GQA ids are numeric "
                        "strings)")
    return p


def make_alpha_cmap():
    """Greyscale ramp with low-attention transparency
    (reference: visualization.py:78-85)."""
    cdict = {
        "red": ((0.0, 0.0, 0.0), (0.6, 0.8, 0.8), (1.0, 1.0, 1.0)),
        "green": ((0.0, 0.0, 0.0), (0.6, 0.8, 0.8), (1.0, 1.0, 1.0)),
        "blue": ((0.0, 0.0, 0.0), (0.6, 0.8, 0.8), (1.0, 1.0, 1.0)),
        "alpha": ((0.0, 0.35, 0.35), (1.0, 0.65, 0.65)),
    }
    return LinearSegmentedColormap("custom", cdict)


def is_right(instance):
    return instance.get("answer") == instance.get("prediction")


def should_skip(args, instance) -> bool:
    """(reference: visualization.py:92-109)"""
    if "length" in args.filter:
        if len(instance["question"].split(" ")) > args.filterLength:
            return True
    if "field" in args.filter:
        if args.filterIn:
            if instance[args.filterField] not in args.filterList:
                return True
        elif not any(l in instance[args.filterField]
                     for l in args.filterList):
            return True
    if "mod" in args.filter:
        if (not is_right(instance)) and args.filterMod:
            return True
        if is_right(instance) and not args.filterMod:
            return True
    return False


def in_img_name(args, image_id):
    d = args.imagesDir or f"./CLEVR_v1/images/{args.tier}"
    if args.dataset == "CLEVR":
        try:
            return "{}/CLEVR_{}_{}.png".format(
                d, args.tier, ("000000%d" % int(image_id))[-6:])
        except (TypeError, ValueError):
            pass
    # NLVR/GQA (and non-numeric CLEVR ids): the id names the file — real
    # GQA ids are numeric STRINGS, so the --dataset flag, not
    # int()-ability, picks the branch
    return f"{d}/{image_id}.png"


def out_name(args, instance, suffix):
    return os.path.join(
        args.predsDir, args.expName,
        f"{args.tier}{instance['index']}{suffix}.png")


def show_img_atts(args, instance, cmap):
    """Per-step KB attention overlays (reference: visualization.py:130-144)."""
    try:
        img = plt.imread(in_img_name(args, instance["imageId"]))
    except (FileNotFoundError, OSError):
        img = np.zeros((320, 480, 3))  # placeholder when raw pngs absent
    h, w = args.imageDims
    extent = (-1.5, 1.5, -1.0, 1.0)
    for j, att in enumerate(instance["attentions"]["kb"]):
        fig, ax = plt.subplots(figsize=(3, 2))
        ax.imshow(img, interpolation="nearest", extent=extent)
        ax.imshow(np.asarray(att, np.float32).reshape(h, w),
                  cmap=cmap, interpolation="bicubic", extent=extent)
        ax.set_axis_off()
        ax.set_aspect("auto")
        plt.subplots_adjust(bottom=0, top=1, left=0, right=1)
        plt.savefig(out_name(args, instance, f"Img_{j + 1}"), dpi=180)
        plt.close(fig)


def show_table_att(args, instance, table, rows, cols, name):
    """Steps-x-words heatmap (reference: visualization.py:146-181)."""
    import pandas as pd
    import seaborn as sns
    fig, ax = plt.subplots(1, 1)
    if args.trans:
        table = np.transpose(table)
        rows, cols = cols, rows
    frame = pd.DataFrame(data=table, index=rows, columns=cols)
    ax = sns.heatmap(frame, cmap="Purples", cbar=False, linewidths=0.5,
                     linecolor="gray", square=True)
    if args.trans:
        ax.xaxis.tick_top()
    plt.setp(plt.xticks()[1], rotation=0 if args.trans else 60)
    plt.setp(plt.yticks()[1], rotation=0)
    right = "RIGHT" if is_right(instance) else "WRONG"
    suffix = f"{name}_{right}" + ("_t" if args.trans else "")
    plt.savefig(out_name(args, instance, suffix), dpi=180)
    plt.close(fig)


def main(args=None):
    if args is None:
        args = build_parser().parse_args()
    cmap = make_alpha_cmap() if args.cmap == "custom" \
        else plt.get_cmap(args.cmap)

    preds_file = os.path.join(
        args.predsDir, args.expName,
        f"{args.tier}Predictions-{args.expName}.json")
    with open(preds_file) as f:
        results = json.load(f)

    indices = args.instances if args.instances else range(len(results))
    count = 0
    for i in indices:
        instance = results[i]
        if "attentions" not in instance or should_skip(args, instance):
            continue
        if args.maxNum > 0 and count >= args.maxNum:
            break
        count += 1

        show_img_atts(args, instance, cmap)

        steps = len(instance["attentions"]["kb"])
        words = instance["question"].split(" ")
        table = np.asarray(instance["attentions"]["question"],
                           np.float32)[:, :len(words) + 1]
        # pad word labels if the attention rows are longer (kept puncts)
        cols = (words + ["<pad>"] * table.shape[1])[:table.shape[1]]
        show_table_att(args, instance, table, range(1, steps + 1), cols,
                       "text")

        if args.sa and "self" in instance["attentions"]:
            sa = np.asarray(instance["attentions"]["self"], np.float32)
            show_table_att(args, instance, sa, range(1, sa.shape[0] + 1),
                           range(sa.shape[1]), "sa")

        print(i)
        print("id:", instance["index"])
        print("img:", instance["imageId"])
        print("Q:", instance["question"])
        print("G:", instance.get("answer"))
        print("P:", instance.get("prediction"))
        print("RIGHT" if is_right(instance) else "WRONG")
        if args.gate and "gate" in instance["attentions"]:
            print(instance["attentions"]["gate"])
        print("_" * 72)


if __name__ == "__main__":
    main()
