"""Dropout helpers, keep-prob style.

The reference uses TF keep-prob semantics throughout (``tf.nn.dropout(x,
keep)``), feeding 1.0 at eval (reference: model.py:118-125).  We keep the
keep-prob convention in the config flags and convert here.

Variational dropout: one mask per batch, reused across all reasoning steps
(reference: ops.py:1054-1067; mask created in zero_state, mac_cell.py:589-590).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jnp.ndarray, keep: float, rng, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout with keep probability ``keep``
    (reference semantics: tf.nn.dropout)."""
    if deterministic or keep >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def generate_var_dp_mask(rng, shape, keep: float) -> jnp.ndarray:
    """Binary mask sampled once and reused across time steps
    (reference: ops.py:1054-1059)."""
    return jax.random.bernoulli(rng, p=keep, shape=shape).astype(jnp.float32)


def apply_var_dp_mask(x: jnp.ndarray, mask: jnp.ndarray, keep: float) -> jnp.ndarray:
    """Scale-and-mask (reference: ops.py:1065-1067)."""
    return (x / keep) * mask.astype(x.dtype)
