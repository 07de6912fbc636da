"""Linear / FC layers with the reference's exact quirks
(reference: ops.py:298-359).

Parity notes (these are load-bearing for matching the TF1 model):
  * ``features == 1`` uses a *vector* weight ``(inDim,)`` and a scalar bias,
    computed as ``sum(x * w, -1) + b`` (reference: ops.py:304-317) — this is
    the attention-logits path.
  * When ``act != "NON"`` and ``act_layer`` is True, a SECOND stacked linear
    (features -> features, no activation) is applied on top
    (reference: ops.py:325-328).  Easy to miss; on by default.
  * The constant ``bias`` argument is an offset added on top of the
    zero-initialized bias parameter (reference: ops.py:305), used by the
    write gate (``writeGateBias``, mac_cell.py:363).
  * Optional input batch-norm (center+scale, reference: ops.py:307-309) and
    input dropout (keep-prob, reference: ops.py:312).

On TPU: matmuls run on the MXU in the activation dtype (bf16 under mixed
precision) with f32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.activations import Act


class Linear(nn.Module):
    """The reference's ``ops.linear`` (ops.py:298-333)."""
    features: int
    cfg: Config
    dropout: float = 1.0        # keep-prob on inputs
    batch_norm: bool = False
    add_bias: bool = True
    bias: float = 0.0           # constant offset on top of the bias param
    act: str = "NON"
    act_layer: bool = True      # stack a second linear when act != NON
    act_dropout: float = 1.0    # input keep-prob of the stacked linear

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        in_dim = x.shape[-1]

        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=cfg.bnDecay,
                use_bias=True, use_scale=True, dtype=x.dtype,
                name="bn")(x)

        if self.dropout < 1.0:
            x = nn.Dropout(rate=1.0 - self.dropout, deterministic=not train)(x)

        if self.features > 1:
            w = self.param("weight", nn.initializers.glorot_uniform(),
                           (in_dim, self.features), jnp.float32)
            y = jnp.dot(x, w.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
            if self.add_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                y = y + (b.astype(x.dtype) + jnp.asarray(self.bias, x.dtype))
        else:
            # scalar-logit path: vector weight (reference: ops.py:304, 317)
            w = self.param("weight", _vector_glorot, (in_dim,), jnp.float32)
            y = jnp.sum(x * w.astype(x.dtype), axis=-1)
            if self.add_bias:
                b = self.param("bias", nn.initializers.zeros, (), jnp.float32)
                y = y + (b.astype(x.dtype) + jnp.asarray(self.bias, x.dtype))

        y = Act(self.act, cfg, name="act")(y)

        # stacked second linear when activated (reference: ops.py:325-328)
        if self.act != "NON" and self.act_layer:
            y = Linear(self.features, cfg, dropout=self.act_dropout,
                       batch_norm=self.batch_norm, add_bias=self.add_bias,
                       act="NON", act_layer=False, name="linear_2")(y, train)
        return y


def _vector_glorot(key, shape, dtype=jnp.float32):
    """Glorot-uniform for a rank-1 weight: TF's xavier_initializer treats a
    (d,) shape as fan_in = fan_out = d (reference: ops.py:20-23 via
    tf.contrib.layers.xavier_initializer on shape (inDim,))."""
    import jax
    d = shape[0]
    limit = jnp.sqrt(jnp.asarray(3.0 / d, dtype))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class FCLayer(nn.Module):
    """Multi-layer FC network (reference: ops.py:349-359).

    ``dims`` are the hidden+output feature sizes (the reference passes the
    input size too; here it is inferred).  Activation between layers, not
    after the last; activation applied *outside* the linear, so the
    act_layer quirk does not trigger here (reference: ops.py:353-357).
    """
    dims: Sequence[int]
    cfg: Config
    batch_norm: bool = False
    dropout: float = 1.0
    act: str = "RELU"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = Linear(d, self.cfg, dropout=self.dropout,
                       batch_norm=self.batch_norm, name=f"fc_{i}")(x, train)
            if i < n - 1:
                x = Act(self.act, self.cfg, name=f"act_{i}")(x)
        return x
