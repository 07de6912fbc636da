"""Multi-host (multi-process) support.

The reference is strictly single-process (SURVEY.md §2 "Distributed
backend: none"); the TPU-native equivalent is ``jax.distributed`` over
ICI/DCN.  This module provides:

  * ``maybe_initialize(cfg)`` — ``jax.distributed.initialize`` hook, driven
    by flags or the standard JAX env vars, called before first backend use.
  * ``local_rows(...)``        — pure index math mapping a process to its
    slice of the padded global batch (unit-testable without N hosts).
  * ``host_local_batch(...)``  — slice a host-prepped batch down to this
    process's rows (so each host reads ONLY its own image features from
    disk — the dominant IO).
  * ``assemble_global(...)``   — build global jax.Arrays from per-process
    local shards via ``jax.make_array_from_process_local_data``; on a
    single process this is exactly ``device_put`` with a sharding.

Design: every process runs the same deterministic driver (same seed, same
batch order — main.py seeds python/numpy RNG), so batch composition needs
no coordination; each process independently takes rows
``[pi*B/pc, (pi+1)*B/pc)`` of every global batch.  Gradient reduction is
the same XLA psum the single-host mesh path uses — GSPMD spans hosts
transparently once arrays are constructed globally.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from mac_network_tpu.config import Config


def maybe_initialize(cfg: Config) -> bool:
    """Call ``jax.distributed.initialize`` when configured for >1 process.

    Sources, in priority order: explicit flags (--coordinatorAddress /
    --processCount / --processIndex), then the standard cluster env vars
    JAX auto-detects.  Returns True when distributed init ran.  Must be
    called BEFORE any JAX backend use.
    """
    addr = cfg.coordinatorAddress or os.environ.get("JAX_COORDINATOR_ADDRESS")
    count = cfg.processCount or int(os.environ.get("JAX_NUM_PROCESSES", 0))
    if not addr or count <= 1:
        return False
    index = cfg.processIndex
    if index < 0:
        index = int(os.environ.get("JAX_PROCESS_ID", 0))
    import jax
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=count, process_id=index)
    return True


def process_info() -> Tuple[int, int]:
    """(process_index, process_count); (0, 1) before/without distributed."""
    import jax
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def local_rows(n_valid: int, batch_size: int, process_index: int,
               process_count: int) -> Tuple[List[int], np.ndarray]:
    """This process's rows of the padded global batch.

    The global batch is ``n_valid`` real rows padded to ``batch_size`` by
    repeating the last row (data/loader.py pad_batch).  Returns
    (source_rows, mask): ``source_rows[i]`` is the index into the *unpadded*
    arrays to place at local row i (pad rows point at the last real row),
    and ``mask[i]`` is 1.0 for real rows, 0.0 for padding.

    Requires batch_size % process_count == 0 (checked by the caller /
    main.py's divisibility guard).
    """
    assert batch_size % process_count == 0, (batch_size, process_count)
    per = batch_size // process_count
    start = process_index * per
    rows = [min(r, n_valid - 1) for r in range(start, start + per)]
    mask = np.asarray([1.0 if r < n_valid else 0.0
                       for r in range(start, start + per)], np.float32)
    return rows, mask


def host_local_batch(batch: Dict, batch_size: int, process_index: int,
                     process_count: int,
                     image_loader=None, compute_dtype: str = "float32",
                     load_images: bool = True) -> Dict:
    """Slice a trimmed (unpadded) batch to this process's rows, loading
    image features ONLY for those rows (per-process IO sharding —
    the working replacement for the reference's single-process h5 reads,
    main.py:325-334).  ``load_images=False`` (HBM feature cache active)
    keeps the GQA object counts but skips the h5 feature read — the
    consumer gathers features on-device from the sharded table."""
    n_valid = len(batch["answers"])
    rows, mask = local_rows(n_valid, batch_size, process_index, process_count)
    out = dict(batch)
    for k in ("questions", "questionLengths", "answers"):
        out[k] = np.asarray(batch[k])[rows]
    if "imageIds" in batch:
        out["imageIds"] = [batch["imageIds"][r] for r in rows]
    if image_loader is not None:
        id_batch = {"imageIds": out["imageIds"]}
        n_obj = image_loader.objects_num(id_batch)
        if n_obj is not None:                   # GQA valid-object counts
            out["imageObjectsNum"] = n_obj
        if load_images:
            images = image_loader.load_batch(id_batch)
            if compute_dtype == "bfloat16":
                import ml_dtypes
                images = images.astype(ml_dtypes.bfloat16)
            out["images"] = images
    elif "images" in batch:
        out["images"] = np.asarray(batch["images"])[rows]
        if "imageObjectsNum" in batch:
            out["imageObjectsNum"] = np.asarray(
                batch["imageObjectsNum"])[rows]
    out["mask"] = mask
    out["localRows"] = rows
    return out


def assemble_global(batch: Dict, mesh, batch_size: int) -> Dict:
    """Per-process local arrays -> global jax.Arrays sharded over 'data'.

    Uses ``jax.make_array_from_process_local_data``: each process
    contributes its rows; the result is a single global array GSPMD can
    partition across all hosts' devices.  Single-process (the simulated
    CPU mesh and the one-chip TPU) degenerates to a sharded device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k in ("questions", "questionLengths", "images", "answers", "mask",
              "imageObjectsNum"):
        if k not in batch:
            continue
        local = np.asarray(batch[k])
        global_shape = (batch_size,) + local.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, global_shape)
    return out
