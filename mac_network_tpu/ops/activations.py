"""Activation dispatch (reference: ops.py:152-187).

The reference's ``relu()`` dispatches on ``config.relu`` (STD / PRM / ELU /
LKY); the string-keyed ``activations`` dict maps NON / TANH / SIGMOID /
RELU / ELU, where "RELU" routes through the configurable relu variant.
PReLU carries a learned per-channel alpha (init 0.25, reference:
ops.py:163-167), so the dispatcher is a Flax module; every non-parametric
variant is a plain jnp function that XLA fuses into the surrounding matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config


def apply_act_fn(kind: str, x: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Non-parametric activations. ``kind`` in NON/TANH/SIGMOID/RELU/ELU,
    where RELU dispatches on cfg.relu — use ``Act`` when cfg.relu == "PRM"."""
    if kind == "NON":
        return x
    if kind == "TANH":
        return jnp.tanh(x)
    if kind == "SIGMOID":
        return jax.nn.sigmoid(x)
    if kind == "ELU":
        return jax.nn.elu(x)
    if kind == "RELU":
        r = cfg.relu
        if r == "ELU":
            return jax.nn.elu(x)
        if r == "LKY":
            # reference: ops.py:175 maximum(x, alpha*x)
            return jnp.maximum(x, cfg.reluAlpha * x)
        if r == "SELU":
            return jax.nn.selu(x)
        if r == "PRM":
            raise ValueError("PReLU has parameters; use the Act module")
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation {kind}")


class Act(nn.Module):
    """Activation module; owns the PReLU alpha when cfg.relu == 'PRM'
    (reference: ops.py:161-179)."""
    kind: str
    cfg: Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "RELU" and self.cfg.relu == "PRM":
            alpha = self.param(
                "alpha", nn.initializers.constant(0.25), (x.shape[-1],),
                jnp.float32)
            alpha = alpha.astype(x.dtype)
            return jax.nn.relu(x) - alpha * jax.nn.relu(-x)
        return apply_act_fn(self.kind, x, self.cfg)
