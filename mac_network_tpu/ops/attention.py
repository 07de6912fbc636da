"""Attention primitives (reference: ops.py:94-150, 243-247).

``exp_mask`` adds -1e30 to out-of-length positions before softmax
(reference: ops.py:243-247).  Softmax always runs in float32 even under
bf16 compute — attention over 196 KB cells / <=45 words is tiny relative
to the matmuls, and f32 keeps the distributions exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.linear import Linear

INF = 1e30


def exp_mask(logits: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Additive -inf mask over padded positions (reference: ops.py:243-247).

    logits: [..., L]; lengths: broadcastable to logits[..., 0] shape.
    """
    max_len = logits.shape[-1]
    pos = jnp.arange(max_len)
    mask = pos[None, :] < lengths[:, None]          # [B, L] bool
    mask = mask.reshape(mask.shape[:1] + (1,) * (logits.ndim - 2) + mask.shape[1:])
    return logits + (1.0 - mask.astype(logits.dtype)) * jnp.asarray(-INF, logits.dtype)


def masked_softmax(logits: jnp.ndarray, lengths=None) -> jnp.ndarray:
    """f32 softmax with optional length masking; returns logits' dtype."""
    out_dtype = logits.dtype
    logits = logits.astype(jnp.float32)
    if lengths is not None:
        logits = exp_mask(logits, lengths)
    return jax.nn.softmax(logits, axis=-1).astype(out_dtype)


def att2smry(attention: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """Attention-weighted sum over axis -2 (reference: ops.py:149-150).

    attention: [B, N]; features: [B, N, D] -> [B, D].  Contracted on the MXU
    as a batched mat-vec with f32 accumulation.
    """
    return jnp.einsum("...n,...nd->...d", attention.astype(features.dtype),
                      features, preferred_element_type=jnp.float32
                      ).astype(features.dtype)


class Inter2Logits(nn.Module):
    """Vectors -> scalar logits (reference: ops.py:114-120).

    sum_mod "LIN": learned projection to a scalar (vector weight Linear);
    sum_mod "SUM": plain sum over the feature axis.
    """
    cfg: Config
    sum_mod: str = "LIN"
    dropout: float = 1.0

    @nn.compact
    def __call__(self, interactions: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.sum_mod == "SUM":
            return jnp.sum(interactions, axis=-1)
        return Linear(1, self.cfg, dropout=self.dropout,
                      name="logits")(interactions, train)


class Inter2Att(nn.Module):
    """Vectors -> probability distribution (reference: ops.py:140-144)."""
    cfg: Config
    dropout: float = 1.0

    @nn.compact
    def __call__(self, interactions: jnp.ndarray, lengths=None,
                 train: bool = False) -> jnp.ndarray:
        logits = Inter2Logits(self.cfg, dropout=self.dropout,
                              name="inter2logits")(interactions, train)
        return masked_softmax(logits, lengths)
