"""The "enhanced hadamard" interaction kernel (reference: ops.py:668-725).

This is the workhorse of the read unit (mac_cell.py:230, 248), the
stacked-attention baseline (model.py:335) and answer-embedding logits
(model.py:561).  It supports optional (shared or separate) projections of
x and y into the attention space, four interaction modes, and concatenation
of the raw/projected left operand.

Broadcasting: y is expanded over the N axis of x ([B, N, D] * [B, 1, D]),
so the whole thing is one fused elementwise chain between two MXU matmuls —
exactly what XLA fuses well on TPU.

Deviation from the reference (documented): interMod="DIAG" inside the
reference's ``mul`` assigns to a dead variable and would crash with a
NameError (ops.py:704-707 writes ``activations`` instead of ``output``); we
implement the evidently intended ``x * W * y + b``.  The "concat y" branch
(ops.py:721-723) calls ``ops.concat`` with a wrong signature and is
unreachable from any caller; we raise if requested.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.linear import Linear


class Mul(nn.Module):
    """ops.mul (reference: ops.py:668-725).

    Returns ``(output, x_projected)``; x_projected is None unless ``proj``
    is enabled (the read unit needs the projected KB back,
    mac_cell.py:233, 255, 272).
    """
    cfg: Config
    inter_mod: str = "MUL"          # MUL | DIAG | BL | ADD
    proj_dim: int = 0               # 0 disables projection
    proj_shared: bool = False
    proj_dropout: float = 1.0
    concat_x: bool = False
    concat_proj: bool = False       # concat projected x instead of original
    concat_y: bool = False
    mul_bias: Optional[float] = None
    extend_y: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        orig_x = x
        x_proj = None

        if self.proj_dim > 0:
            if self.proj_dropout < 1.0:
                drop = nn.Dropout(rate=1.0 - self.proj_dropout,
                                  deterministic=not train)
                x = drop(x)
                y = drop(y)
            if self.proj_shared:
                proj = Linear(self.proj_dim, cfg, name="proj")
                x = proj(x, train)
                y = proj(y, train)
            else:
                x = Linear(self.proj_dim, cfg, name="projX")(x, train)
                y = Linear(self.proj_dim, cfg, name="projY")(y, train)
            x_proj = x

        if self.extend_y:
            y = jnp.expand_dims(y, axis=-2)     # broadcast over x's N axis

        dim = x.shape[-1]
        if self.inter_mod == "MUL":
            b = cfg.mulBias if self.mul_bias is None else self.mul_bias
            b = jnp.asarray(b, x.dtype)
            output = (x + b) * (y + b)
        elif self.inter_mod == "DIAG":
            w = self.param("weight", nn.initializers.glorot_uniform(),
                           (1, dim), jnp.float32)[0]
            bias = self.param("bias", nn.initializers.zeros, (dim,),
                              jnp.float32)
            output = x * w.astype(x.dtype) * y + bias.astype(x.dtype)
        elif self.inter_mod == "BL":
            w = self.param("weight", nn.initializers.glorot_uniform(),
                           (dim, dim), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (dim,),
                              jnp.float32)
            output = jnp.dot(x, w.astype(x.dtype),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype) * y + bias.astype(x.dtype)
        else:  # "ADD"
            output = jnp.tanh(x + y)

        if self.concat_x:
            added = x_proj if self.concat_proj else orig_x
            output = jnp.concatenate([output, added], axis=-1)
        if self.concat_y:
            raise NotImplementedError(
                "concat-y is unreachable/broken in the reference "
                "(ops.py:721-723)")
        return output, x_proj
