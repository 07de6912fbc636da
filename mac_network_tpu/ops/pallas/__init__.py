"""Pallas TPU kernels for the MAC hot path."""

from mac_network_tpu.ops.pallas.mac_fused import (
    fused_mac_steps, supports_fused_config, FusedMACEngine)
from mac_network_tpu.ops.pallas.mac_train import (
    mac_train_recurrence, mac_train_recurrence_mesh, supports_fused_train,
    FusedTrainEngine)
