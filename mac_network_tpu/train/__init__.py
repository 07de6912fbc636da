"""Training / evaluation driver (reference: main.py, model.py:593-760)."""

from mac_network_tpu.train.state import TrainState, create_train_state
from mac_network_tpu.train.steps import (
    make_train_step, make_eval_step, make_optimizer)
