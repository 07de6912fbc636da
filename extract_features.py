"""Offline image-feature extraction CLI (reference: extract_features.py).

Extracts ResNet-101 stage-3 features (1024x14x14) from CLEVR images into an
h5 file with dataset "features" [N, C, H, W] — the exact layout the
reference training loop reads (extract_features.py:98-101) — using a
jit-compiled Flax trunk on TPU instead of PyTorch CUDA.

Usage (same flags as the reference, extract_features.py:16-26):
    python extract_features.py --input_image_dir ... --output_h5_file ...
        [--model resnet101 --model_stage 3 --batch_size 128
         --image_height 224 --image_width 224]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input_image_dir", required=True)
    p.add_argument("--max_images", default=None, type=int)
    p.add_argument("--output_h5_file", required=True)
    p.add_argument("--image_height", default=224, type=int)
    p.add_argument("--image_width", default=224, type=int)
    p.add_argument("--model", default="resnet101")
    p.add_argument("--model_stage", default=3, type=int)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--weights", default=None, type=str,
                   help="path to a torch resnet101 state_dict "
                        "(torchvision layout)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv compute dtype; bfloat16 runs the trunk on "
                        "the MXU at the bf16 peak (~1.7x device rate; "
                        "features still written f32 — error bound in "
                        "tests/test_resnet.py)")
    return p


def list_images(input_dir: str, max_images=None):
    """Sorted by the numeric index embedded in CLEVR filenames, with a
    contiguity check (reference: extract_features.py:67-75)."""
    entries = []
    for fn in os.listdir(input_dir):
        if not fn.endswith(".png"):
            continue
        idx = int(os.path.splitext(fn)[0].split("_")[-1])
        entries.append((idx, fn))
    entries.sort()
    if entries:
        img_ids = [i for i, _ in entries]
        assert img_ids[0] == 0 and img_ids[-1] == len(img_ids) - 1, \
            "image indices must be contiguous from 0"
    paths = [os.path.join(input_dir, fn) for _, fn in entries]
    if max_images is not None:
        paths = paths[:max_images]
    return paths


def read_image(path: str, height: int, width: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB").resize(
        (width, height), Image.BICUBIC)
    return np.asarray(img, np.uint8)


def main(args=None):
    import jax
    import jax.numpy as jnp
    import h5py
    from mac_network_tpu.models.resnet import (
        load_pretrained_trunk, preprocess_images)

    if args is None:
        args = build_parser().parse_args()
    assert args.model == "resnet101", "only resnet101 is supported"

    paths = list_images(args.input_image_dir, args.max_images)
    if not paths:
        print("no images found in", args.input_image_dir)
        return

    model, variables = load_pretrained_trunk(
        stage=args.model_stage, weights_path=args.weights,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)

    @jax.jit
    def run(x):
        feats = model.apply(variables, x)          # [B, H, W, C] f32
        return feats.transpose(0, 3, 1, 2)         # CHW layout for h5 parity

    def make_device_batch(start):
        batch_paths = paths[start:start + args.batch_size]
        imgs = np.stack([read_image(p, args.image_height,
                                    args.image_width)
                         for p in batch_paths])
        x = jnp.asarray(preprocess_images(imgs))
        # pad ragged final batch for shape stability
        pad = args.batch_size - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.tile(x[-1:], (pad, 1, 1, 1))])
        return x, len(batch_paths)

    feat_shape = None
    with h5py.File(args.output_h5_file, "w") as f:
        dset = None
        # software pipeline: dispatch batch i+1 before PULLING batch i —
        # jax dispatch is async, so the device computes the next batch
        # while the host blocks on the previous D2H copy + h5 write (the
        # reference overlaps nothing; its PyTorch loop is serial,
        # extract_features.py:84-101)
        pending = None                  # (device feats, start, n_valid)
        starts = list(range(0, len(paths), args.batch_size))
        for start in starts + [None]:
            if start is not None:
                x, n_valid = make_device_batch(start)
                nxt = (run(x), start, n_valid)
            else:
                nxt = None
            if pending is not None:
                feats_d, s0, n0 = pending
                feats = np.asarray(feats_d)[:n0]
                if dset is None:
                    feat_shape = feats.shape[1:]
                    dset = f.create_dataset(
                        "features", (len(paths),) + feat_shape,
                        dtype=np.float32)
                dset[s0:s0 + n0] = feats
                print(f"\rprocessed {s0 + n0} / {len(paths)}",
                      end="", file=sys.stderr)
            pending = nxt
    print(f"\nwrote {len(paths)} feature maps {feat_shape} to "
          f"{args.output_h5_file}")


if __name__ == "__main__":
    main()
