"""memAutoEnc: the memory->control auto-encoder loss
(reference: mac_cell.py:377-405, flags commented in config.py:401-406) —
the last SURVEY §2 inventory row to land."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mac_network_tpu.models import MACNetwork
from mac_network_tpu.train.steps import loss_fn
from tests.test_model import (VARIANTS, make_embedding_init, make_inputs,
                              small_cfg)


def _setup(loss_mode, cnct=False, inputs="INFO"):
    cfg = small_cfg(**VARIANTS["args"], autoEncMem=True,
                    autoEncMemLoss=loss_mode, autoEncMemCnct=cnct,
                    autoEncMemInputs=inputs, autoEncMemW=0.01)
    emb = make_embedding_init(cfg)
    qs, lengths, images, answers = make_inputs()
    model = MACNetwork(cfg, emb)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, qs, lengths, images)
    return cfg, model, variables, (qs, lengths, images, answers)


@pytest.mark.parametrize("mode", ["CONT", "PROB", "SMRY"])
def test_autoenc_loss_per_step_and_finite(mode):
    cfg, model, variables, (qs, lengths, images, _) = _setup(mode)
    _, atts = model.apply(variables, qs, lengths, images, train=False)
    ae = atts["autoEncMem"]
    assert ae.shape == (cfg.netLength,)          # one loss per reasoning step
    assert np.isfinite(np.asarray(ae)).all()
    assert (np.asarray(ae) >= 0).all() or mode == "PROB"


def test_autoenc_params_created():
    cfg, model, variables, _ = _setup("SMRY", cnct=True, inputs="MEM")
    cell = variables["params"]["mac"]["cell"]
    assert "memAutoEnc" in cell
    assert "aeMem" in cell["memAutoEnc"]
    assert "inter2logits" in cell["memAutoEnc"]
    # CONT mode needs only the projection
    cfg2, model2, v2, _ = _setup("CONT")
    assert set(v2["params"]["mac"]["cell"]["memAutoEnc"]) == {"aeMem"}


def test_autoenc_contributes_to_training_loss_and_grads():
    cfg, model, variables, (qs, lengths, images, answers) = _setup("CONT")
    batch = {"questions": qs, "questionLengths": lengths, "images": images,
             "answers": jnp.asarray(answers),
             "mask": jnp.ones((len(answers),), jnp.float32)}
    rng = jax.random.key(2)

    loss_with, _ = loss_fn(model, cfg, variables["params"], None, batch, rng)
    cfg_off = cfg.replace(autoEncMemW=0.0)
    loss_without, _ = loss_fn(model, cfg_off, variables["params"], None,
                              batch, rng)
    assert float(loss_with) != float(loss_without)

    grads = jax.grad(
        lambda p: loss_fn(model, cfg, p, None, batch, rng)[0])(
            variables["params"])
    g = grads["mac"]["cell"]["memAutoEnc"]["aeMem"]["weight"]
    assert float(optax.global_norm(g)) > 0.0     # the AE params get gradient


def test_autoenc_absent_from_eval_attentions():
    from mac_network_tpu.train.steps import make_eval_step
    cfg, model, variables, (qs, lengths, images, answers) = _setup("CONT")
    step = make_eval_step(model, cfg, with_attention=True)
    out = step(variables["params"], None,
               {"questions": qs, "questionLengths": lengths, "images": images,
                "answers": jnp.asarray(answers),
                "mask": jnp.ones((len(answers),), jnp.float32)})
    assert "autoEncMem" not in out["attentions"]
    assert "question" in out["attentions"]
