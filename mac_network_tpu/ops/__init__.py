"""Op library: JAX/Flax equivalents of the reference's ops layer
(reference: ops.py, mi_gru_cell.py, mi_lstm_cell.py).

Everything here is built for XLA on TPU: static shapes, fusable elementwise
chains around MXU matmuls, masked ``lax.scan`` for recurrences, and f32
softmax accumulation even under bf16 compute.
"""

from mac_network_tpu.ops.activations import Act, apply_act_fn
from mac_network_tpu.ops.linear import Linear, FCLayer
from mac_network_tpu.ops.attention import (
    exp_mask, att2smry, masked_softmax, Inter2Logits, Inter2Att)
from mac_network_tpu.ops.mul import Mul
from mac_network_tpu.ops.cnn import Conv, CNNLayer
from mac_network_tpu.ops.rnn import RNNLayer, make_cell
from mac_network_tpu.ops.location import (
    location_l, location_pe, AddLocation, LinearizeFeatures)
from mac_network_tpu.ops.dropout import (
    dropout, generate_var_dp_mask, apply_var_dp_mask)

INF = 1e30
EPS = 1e-20
