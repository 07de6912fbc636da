"""Stochastic ops from the reference's experimental surface
(reference: ops.py:189-235).

These are reachable only from commented-out flags in the reference (gumbel
module-softmax, parametric dropout); provided here as working, tested ops
so the full ops.py surface exists for downstream experimentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

EPS = 1e-20


def sample_gumbel(rng, shape, dtype=jnp.float32):
    """Gumbel(0,1) samples (reference: ops.py:190-192)."""
    u = jax.random.uniform(rng, shape, dtype, 0.0, 1.0)
    return -jnp.log(-jnp.log(u + EPS) + EPS)


def gumbel_softmax_sample(rng, logits, temperature):
    y = logits + sample_gumbel(rng, logits.shape, logits.dtype)
    return jax.nn.softmax(y / temperature, axis=-1)


def gumbel_softmax(rng, logits, temperature, hard: bool):
    """Gumbel-softmax with optional straight-through discretization
    (reference: ops.py:199-223): soft sample for training, one-hot argmax
    with soft gradients when ``hard``."""
    y = gumbel_softmax_sample(rng, logits, temperature)
    if not hard:
        return y
    y_hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
    return jax.lax.stop_gradient(y_hard - y) + y


class ParametricDropout(nn.Module):
    """Learned dropout rate: keep-prob = sigmoid(v), v trainable init 2.0
    (reference: ops.py:231-235).  Identity at eval."""
    name_suffix: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = self.param("varDp" + self.name_suffix,
                       nn.initializers.constant(2.0), (), jnp.float32)
        if not train:
            return x
        keep = jax.nn.sigmoid(v)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros_like(x))


def seq2seq_loss(logits, targets, lengths):
    """Mean masked CE over symbol positions (reference: ops.py:252-255)."""
    import optax
    L = targets.shape[1]
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def seq2seq_accuracy(preds, targets, lengths):
    """Per-symbol and per-sequence accuracy (reference: ops.py:262-273)."""
    L = targets.shape[1]
    mask = jnp.arange(L)[None, :] < lengths[:, None]
    corrects = jnp.logical_and(preds == targets, mask)
    num_correct = jnp.sum(corrects.astype(jnp.int32), axis=1)
    acc1 = jnp.mean(num_correct / jnp.maximum(lengths, 1))
    acc2 = jnp.mean((num_correct == lengths).astype(jnp.float32))
    return acc1, acc2
