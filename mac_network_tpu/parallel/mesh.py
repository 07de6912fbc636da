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

from typing import Any, Optional

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


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] leaves (--stepsPerDispatch): batch axis is SECOND."""
    return NamedSharding(mesh, P(None, "data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf, last_fc: Optional[str]) -> P:
    """Sharding rule for a parameter, by its tree path.

    Vocab-dimension tensors shard over 'model':
      * the word-embedding table  [vocab-1, wrdEmbDim]  -> P('model', None)
      * the classifier output weight [d, answers]       -> P(None, 'model')
      * the classifier output bias   [answers]          -> P('model')
    Everything else (including the classifier's *hidden* FC layers, whose
    512-dims are small and whose sharding would only add collectives) is
    replicated.
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    if name.endswith("qEmbeddings/emb") or name.endswith("qEmbeddings/aEmb"):
        return P("model", None)
    # only fc_<last> holds the answer (vocab-dim) projection
    if "classifier" in keys and last_fc is not None and last_fc in keys:
        if keys[-1] == "weight" and getattr(leaf, "ndim", 0) == 2:
            return P(None, "model")
        if keys[-1] == "bias" and getattr(leaf, "ndim", 0) == 1:
            return P("model")
    return P()


def _last_classifier_fc(variables: Any) -> Optional[str]:
    """Name (fc_<i>) of the classifier's final FC layer in the tree."""
    best = None
    for path, _ in jax.tree_util.tree_leaves_with_path(variables):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "classifier" in keys:
            for k in keys:
                if k.startswith("fc_"):
                    idx = int(k.split("_")[1])
                    if best is None or idx > best:
                        best = idx
    return None if best is None else f"fc_{best}"


def shard_params(variables: Any, mesh: Mesh) -> Any:
    """device_put the variable tree with per-leaf shardings."""
    last_fc = _last_classifier_fc(variables)
    def place(path, leaf):
        spec = _param_spec(path, leaf, last_fc)
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


def shard_batch_stacked(batch: Any, mesh: Mesh) -> Any:
    """Shard a K-stacked batch dict ([K, B, ...] leaves, --stepsPerDispatch)
    over 'data' on the SECOND axis — the leading axis is the scan axis."""
    sharding = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding),
                        batch)
