"""Pallas TPU kernels for the MAC hot path."""

from mac_network_tpu.ops.pallas.mac_fused import (
    fused_mac_steps, supports_fused_config, FusedMACEngine)
