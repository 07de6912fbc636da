"""Conv layers (reference: ops.py:380-438).

NHWC convs with SAME padding, optional input batch-norm and dropout, and
the configurable activation *after each layer including the last*
(reference: CNNLayer comment, ops.py:422).

On TPU, 3x3 convs over the 14x14x1024 feature grid map straight onto the
MXU via XLA's conv-to-matmul lowering; keep channels a multiple of 128.

Note: the reference's conv batch-norm reads ``center``/``scale`` keys that
the stem never supplies (ops.py:393 vs model.py:96) — enabling --stemBN
crashes the reference with a KeyError; here it works, using bnCenter /
bnScale flags.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.activations import Act


class Conv(nn.Module):
    """One conv layer (reference: ops.py:380-405)."""
    features: int
    cfg: Config
    kernel_size: Optional[int] = None
    stride: int = 1
    batch_norm: bool = False
    dropout: float = 1.0
    add_bias: bool = True
    act: str = "NON"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        k = self.kernel_size if self.kernel_size is not None else cfg.stemKernelSize

        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=cfg.bnDecay,
                use_bias=cfg.bnCenter, use_scale=cfg.bnScale,
                dtype=x.dtype, name="bn")(x)
        if self.dropout < 1.0:
            x = nn.Dropout(rate=1.0 - self.dropout, deterministic=not train)(x)

        x = nn.Conv(
            features=self.features, kernel_size=(k, k),
            strides=(self.stride, self.stride), padding="SAME",
            use_bias=self.add_bias, dtype=x.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(), name="conv")(x)
        return Act(self.act, cfg, name="act")(x)


class CNNLayer(nn.Module):
    """Multi-layer conv stack (reference: ops.py:423-438)."""
    dims: Sequence[int]               # output feature sizes per layer
    cfg: Config
    batch_norm: bool = False
    dropout: float = 1.0
    kernel_sizes: Optional[Sequence[int]] = None
    strides: Optional[Sequence[int]] = None
    act: str = "RELU"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = len(self.dims)
        ks = self.kernel_sizes or [self.cfg.stemKernelSize] * n
        ss = self.strides or [1] * n
        for i, d in enumerate(self.dims):
            x = Conv(d, self.cfg, kernel_size=ks[i], stride=ss[i],
                     batch_norm=self.batch_norm, dropout=self.dropout,
                     act=self.act, name=f"cnn_{i}")(x, train)
        return x
