"""ResNet trunk conversion parity: the Flax trunk with converted
torchvision-layout weights must reproduce torch's features
(SURVEY.md §7 hard part: "feature-level equivalence tests").

torchvision is not in this image, so a minimal pure-torch bottleneck
network with torchvision's exact state_dict key layout serves as the
reference implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

BLOCKS = (2, 2, 2, 2)   # small stand-in for ResNet-101's (3, 4, 23, 3)


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv)."""
    def __init__(self, in_ch, features, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, features, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(features)
        self.conv2 = tnn.Conv2d(features, features, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(features)
        self.conv3 = tnn.Conv2d(features, features * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(features * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, features * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(features * 4))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class TorchTrunk(tnn.Module):
    def __init__(self, stage=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        features = (64, 128, 256, 512)
        in_ch = 64
        for s in range(stage):
            blocks = []
            f = features[s]
            for b in range(BLOCKS[s]):
                stride = 2 if (b == 0 and s > 0) else 1
                blocks.append(TorchBottleneck(in_ch, f, stride=stride,
                                              downsample=(b == 0)))
                in_ch = f * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
        self.stage = stage

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(self.stage):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


def test_trunk_matches_torch_reference():
    import jax.numpy as jnp
    from mac_network_tpu.models.resnet import (
        ResNetTrunk, convert_torchvision_weights)

    torch.manual_seed(0)
    tv = TorchTrunk(stage=3)
    # randomize BN stats so running-stat conversion is actually exercised
    for m in tv.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    tv.eval()

    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = tv(torch.from_numpy(x)).numpy()

    variables = convert_torchvision_weights(tv.state_dict(), stage=3,
                                            blocks_per_stage=BLOCKS)
    model = ResNetTrunk(stage=3, blocks_per_stage=BLOCKS)
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_preprocess_images():
    from mac_network_tpu.models.resnet import preprocess_images
    imgs = np.full((1, 4, 4, 3), 255, np.uint8)
    out = preprocess_images(imgs)
    np.testing.assert_allclose(
        out[0, 0, 0], (1.0 - np.array([0.485, 0.456, 0.406]))
        / np.array([0.229, 0.224, 0.225]), rtol=1e-5)


def test_bf16_trunk_matches_f32():
    """extract_features.py --dtype bfloat16 runs the convs on the MXU; the
    f32-output features must stay within a low-precision envelope of the
    f32 trunk (measured ~0.8% of the activation scale at stage 2)."""
    import jax
    import jax.numpy as jnp
    from mac_network_tpu.models.resnet import ResNetTrunk

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 64, 64, 3).astype(np.float32))
    f32 = ResNetTrunk(stage=2, blocks_per_stage=BLOCKS)
    variables = f32.init(jax.random.key(0), x[:1])
    y32 = np.asarray(f32.apply(variables, x))

    bf16 = ResNetTrunk(stage=2, blocks_per_stage=BLOCKS, dtype=jnp.bfloat16)
    y16 = bf16.apply(variables, x)            # same param tree, cast per-op
    assert y16.dtype == jnp.float32           # output is cast back
    scale = np.abs(y32).max()
    assert scale > 0
    rel = np.abs(np.asarray(y16) - y32).max() / scale
    assert rel < 3e-2, f"bf16 trunk diverged: rel={rel}"
