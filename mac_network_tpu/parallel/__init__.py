"""Parallelism: jax.sharding Mesh + pjit data/model parallelism.

This replaces — and fixes — the reference's in-graph multi-GPU towers,
whose gradient averaging was left unimplemented (model.py:671-679 takes
tower 0 only).  Here the batch is sharded over the 'data' mesh axis and XLA
inserts the gradient psum over ICI automatically; large vocab-dim tensors
can additionally shard over a 'model' axis.
"""

from mac_network_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicate, shard_params, shard_batch,
    shard_batch_stacked)
from mac_network_tpu.parallel.multihost import (
    assemble_global, host_local_batch, local_rows, maybe_initialize,
    process_info)
