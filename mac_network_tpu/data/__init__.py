"""Host-side data pipeline (reference: preprocess.py, program_translator.py).

Pure Python/numpy — everything here runs on the host; arrays cross to the
TPU through the loader's double-buffered ``jax.device_put`` prefetcher.
"""

from mac_network_tpu.data.symbol_dict import SymbolDict
from mac_network_tpu.data.program_translator import ProgramTranslator
from mac_network_tpu.data.preprocess import Preprocesser
