"""Device mesh and sharding rules.

Mesh axes:
  * ``data``  — batch (data parallelism).  Gradients are reduced with an XLA
    psum over ICI; this is the working replacement for the reference's
    vestigial tower averaging (model.py:671-679).
  * ``model`` — vocab-dim tensor parallelism for the biggest matrices (the
    word-embedding table and the classifier's output projection).  The MAC
    model is ~10-40M params, so this axis is 1 by default and exists to
    demonstrate/validate TP sharding at scale (SURVEY.md §2 "Parallelism").

All other parameters are replicated: they are small (d x d with d<=512),
and replication keeps every matmul local.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mac_network_tpu.config import Config


def make_mesh(cfg: Config, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    n_model = max(1, cfg.meshModel)
    n_data = cfg.meshData if cfg.meshData > 0 else n // n_model
    assert n_data * n_model <= n, (
        f"mesh {n_data}x{n_model} needs more than {n} devices")
    mesh_devices = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[:n_data * n_model])
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf) -> P:
    """Sharding rule for a parameter, by its tree path.

    Vocab-dimension tensors shard over 'model':
      * the word-embedding table  [vocab-1, wrdEmbDim]  -> P('model', None)
      * the classifier output weight [d, answers]       -> P(None, 'model')
      * the classifier output bias   [answers]          -> P('model')
    Everything else is replicated.
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    if name.endswith("qEmbeddings/emb") or name.endswith("qEmbeddings/aEmb"):
        return P("model", None)
    # last FC layer of the classifier
    if "classifier" in keys and "fc" in keys:
        # fc_<last> holds the answer projection; shard its output dim
        fc_layers = [k for k in keys if k.startswith("fc_")]
        if fc_layers and keys[-1] == "weight" and getattr(leaf, "ndim", 0) == 2:
            return P(None, "model")
        if fc_layers and keys[-1] == "bias" and getattr(leaf, "ndim", 0) == 1:
            return P("model")
    return P()


def shard_params(variables: Any, mesh: Mesh) -> Any:
    """device_put the variable tree with per-leaf shardings."""
    def place(path, leaf):
        spec = _param_spec(path, leaf)
        # only shard when the axis divides evenly; else replicate
        if any(s is not None for s in spec):
            dim_map = {s: i for i, s in enumerate(spec) if s is not None}
            for axis_name, dim in dim_map.items():
                size = mesh.shape[axis_name]
                if leaf.shape[dim] % size != 0:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, variables)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in the batch dict over the 'data' axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding),
                        batch)
