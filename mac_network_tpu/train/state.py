"""Training state: params + optimizer state + EMA shadow params + step.

The reference keeps EMA shadow variables inside the TF graph and swaps
checkpoints around evaluation (model.py:658-667, main.py:716-729).  Here the
EMA is an explicit pytree in the state — evaluation simply reads
``state.ema_params`` instead of restore/save gymnastics, with identical
semantics (decay 0.999 over all trainables, reference: config.py:178).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from mac_network_tpu.config import Config


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any            # None when cfg.useEMA is False
    batch_stats: Any           # None unless batch-norm is enabled
    step: jnp.ndarray          # global step (reference: model.py:617)

    def eval_params(self, use_ema: bool):
        return self.ema_params if (use_ema and self.ema_params is not None) \
            else self.params


def create_train_state(cfg: Config, variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.useEMA else None
    return TrainState(params=params, opt_state=opt_state, ema_params=ema,
                      batch_stats=batch_stats,
                      step=jnp.zeros((), jnp.int32))
