"""Jitted train / eval steps (reference: model.py:593-669, 732-760).

One fused device program per step: forward -> CE loss -> backward ->
global-norm (+optional clip) -> Adam -> EMA update.  The learning rate is a
scalar argument so the host-side plateau-decay heuristic
(reference: main.py:239-255) changes it without recompilation.

Batches may be padded to a fixed batch size for shape stability; the
``mask`` entry weights the loss/accuracy so padding rows contribute nothing
(the reference instead feeds ragged final batches and eats the recompile —
model.py:746).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from mac_network_tpu.config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping, in the reference's order:
    norm -> clip -> adam (model.py:644-655).  The -lr scaling happens in the
    train step so lr stays a runtime scalar."""
    txs = []
    if cfg.clipGradients:
        txs.append(optax.clip_by_global_norm(cfg.gradMaxNorm))
    txs.append(optax.scale_by_adam())
    return optax.chain(*txs)


def _var_subset_mask(cfg: Config, params):
    """Zero gradients outside the trained variable subset
    (reference: model.py:626-636 trainSubset/varSubset)."""
    if not cfg.trainSubset:
        return None
    def keep(path):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        return any(s in name for s in cfg.varSubset)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.asarray(1.0 if keep(p) else 0.0, x.dtype), params)


def _l2_loss(cfg: Config, params) -> jnp.ndarray:
    """L2 on weight/kernel parameters (reference: ops.py:84-92; enabled by
    the --l2 flag)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(k, "key", str(k)) for k in path).lower()
        if "weight" in name or "kernel" in name or "conv" in name:
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return cfg.l2 * total


def loss_fn(model, cfg: Config, params, batch_stats, batch, rng):
    variables = {"params": params}
    # GQA object features: per-example valid-object count masks the read
    # unit's KB attention (models/mac_cell.py ReadUnit)
    kb_kw = ({"kb_lengths": batch["imageObjectsNum"]}
             if "imageObjectsNum" in batch else {})
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        (logits, atts), new_vars = model.apply(
            variables, batch["questions"], batch["questionLengths"],
            batch["images"], train=True, rngs={"dropout": rng},
            mutable=["batch_stats"], **kb_kw)
    else:
        logits, atts = model.apply(
            variables, batch["questions"], batch["questionLengths"],
            batch["images"], train=True, rngs={"dropout": rng}, **kb_kw)
        new_vars = {}
    labels = batch["answers"]
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    mask = batch.get("mask")
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(losses * mask) / denom
    else:
        loss = jnp.mean(losses)
    if cfg.l2 > 0:
        loss = loss + _l2_loss(cfg, params)
    # memory auto-encoder loss, summed over reasoning steps
    # (reference: mac_cell.py:377-405 with weight autoEncMemW)
    if cfg.autoEncMem and "autoEncMem" in atts:
        loss = loss + cfg.autoEncMemW * jnp.sum(atts["autoEncMem"])
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    corrects = (preds == labels).astype(jnp.float32)
    if mask is not None:
        corrects = corrects * mask
    aux = {"preds": preds, "correct": jnp.sum(corrects),
           "batch_stats": new_vars.get("batch_stats")}
    return loss, aux


def _train_step_body(model, cfg: Config, tx, state, batch, lr, rng):
    """One training step: fwd -> CE -> bwd -> clip -> Adam -> EMA.  Shared
    by the per-batch jitted step and the multi-batch scan dispatch (the
    rng folds in state.step, so a scanned step K batches deep draws the
    identical dropout masks as K sequential single-step calls)."""
    rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(model, cfg, p, state.batch_stats, batch, rng),
        has_aux=True)
    (loss, aux), grads = grad_fn(state.params)

    mask = _var_subset_mask(cfg, state.params)
    if mask is not None:
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)

    grad_norm = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)

    ema = state.ema_params
    if ema is not None:
        d = cfg.emaDecayRate
        ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    new_state = state.replace(
        params=params, opt_state=opt_state, ema_params=ema,
        batch_stats=aux["batch_stats"] if aux["batch_stats"] is not None
        else state.batch_stats,
        step=state.step + 1)
    metrics = {"loss": loss, "correct": aux["correct"],
               "preds": aux["preds"], "gradNorm": grad_norm}
    return new_state, metrics


def make_train_step(model, cfg: Config, tx):
    """Build the jitted training step.  Donates the state so params update
    in place in HBM."""

    def train_step(state, batch, lr, rng):
        return _train_step_body(model, cfg, tx, state, batch, lr, rng)

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_multistep(model, cfg: Config, tx):
    """K optimizer steps in ONE device dispatch (--stepsPerDispatch K):
    ``batches`` is the per-batch pytree stacked on a leading K axis and
    the step body runs under ``lax.scan``.  Per-step host dispatch
    through a tunneled/remote TPU costs ~1-4 ms; the scan amortizes it
    to 1/K while computing numerically identical results to K sequential
    single-step calls — same math and same dropout masks (the body folds
    the rng with state.step, which increments through the scan); only
    XLA fusion-order rounding (~1e-6) differs.  Metrics come back stacked [K, ...]
    so the driver logs per-batch rows exactly as before.  TPU-first
    design; the reference dispatches one sess.run per batch
    (model.py:746)."""

    def multi_step(state, batches, lr, rng):
        def body(st, batch):
            return _train_step_body(model, cfg, tx, st, batch, lr, rng)
        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_fused_eval_step(engine, cfg: Config):
    """Eval step driving the fused Pallas serving engine (--usePallas;
    see ops/pallas/mac_fused.py).  No attention outputs — the XLA path
    serves getAtt."""

    def eval_step(params, batch_stats, batch):
        kb_kw = ({"kb_lengths": batch["imageObjectsNum"]}
                 if "imageObjectsNum" in batch else {})
        logits = engine({"params": params}, batch["questions"],
                        batch["questionLengths"], batch["images"], **kb_kw)
        labels = batch["answers"]
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        mask = batch.get("mask")
        if mask is not None:
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            loss = jnp.sum(losses * mask) / denom
        else:
            loss = jnp.mean(losses)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        corrects = (preds == labels).astype(jnp.float32)
        if mask is not None:
            corrects = corrects * mask
        return {"loss": loss, "correct": jnp.sum(corrects), "preds": preds}

    return jax.jit(eval_step)


def make_eval_step(model, cfg: Config, with_attention: bool = False):
    """Evaluation step; reads EMA params when enabled (the reference's
    checkpoint-swap semantics, main.py:716-729)."""

    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        kb_kw = ({"kb_lengths": batch["imageObjectsNum"]}
                 if "imageObjectsNum" in batch else {})
        logits, atts = model.apply(
            variables, batch["questions"], batch["questionLengths"],
            batch["images"], train=False, **kb_kw)
        labels = batch["answers"]
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        mask = batch.get("mask")
        if mask is not None:
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            loss = jnp.sum(losses * mask) / denom
        else:
            loss = jnp.mean(losses)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        corrects = (preds == labels).astype(jnp.float32)
        if mask is not None:
            corrects = corrects * mask
        out = {"loss": loss, "correct": jnp.sum(corrects), "preds": preds}
        if with_attention:
            # the auto-encoder entry is a per-step loss, not an attention map
            out["attentions"] = {k: v for k, v in atts.items()
                                 if k != "autoEncMem"}
        return out

    return jax.jit(eval_step)
