"""Model layer: the MAC cell and network plus baselines, in Flax
(reference: mac_cell.py, model.py)."""

from mac_network_tpu.models.mac_cell import ControlUnit, ReadUnit, WriteUnit, MACCell
from mac_network_tpu.models.mac_network import MACNetwork
from mac_network_tpu.models.baselines import Baseline
