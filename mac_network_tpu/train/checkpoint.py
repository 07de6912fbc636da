"""Checkpointing via Orbax (reference: tf.train.Saver usage,
main.py:163-201, 609-613, 712-729).

One checkpoint per epoch under ./weights/{exp}/weights{epoch}/, keeping the
last ``weightsToKeep`` (reference: main.py:164).  Unlike the reference —
which needs three savers and swaps EMA/raw weights on disk around every
evaluation — the whole TrainState (params + Adam moments + EMA + step) is
one pytree, so resume restores optimizer state and EMA exactly, and
mid-epoch saves (saveEvery) are cheap.

A name-filtered subset save (saveSubset/varSubset, reference:
main.py:166-170) writes a second pytree with only matching parameters.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mac_network_tpu.config import Config


def _epoch_dirs(cfg: Config):
    d = cfg.weightsDir()
    out = []
    for name in os.listdir(d):
        if name.startswith("weights") and name[7:].isdigit():
            out.append(int(name[7:]))
    return sorted(out)


def _cursor_file(cfg: Config, epoch: int) -> str:
    return os.path.join(os.path.abspath(cfg.weightsDir()),
                        f"cursor{epoch}.json")


def read_cursor(cfg: Config, epoch: int) -> int:
    """Batch cursor of an interrupted epoch's checkpoint (0 = the epoch
    completed, or no such checkpoint).  Written as a JSON sidecar next to
    the orbax dirs so old checkpoints stay restorable."""
    import json
    try:
        with open(_cursor_file(cfg, epoch)) as f:
            c = int(json.load(f)["batchCursor"])
    except (OSError, ValueError, KeyError):
        return 0
    path = os.path.abspath(cfg.weightsFile(epoch))
    return c if os.path.isdir(path) else 0


def save_checkpoint(cfg: Config, state, epoch: int,
                    extra: Optional[dict] = None) -> str:
    """Save the full TrainState (+ host metadata) for ``epoch`` and prune
    old epochs beyond weightsToKeep.  ``extra["batchCursor"] > 0`` marks a
    mid-epoch (preemption / saveEvery) checkpoint: the cursor rides in a
    sidecar so --restore resumes the epoch at exactly the next batch."""
    import json
    path = os.path.abspath(cfg.weightsFile(epoch))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    extra = dict(extra or {})
    payload = {"state": state,
               "extra": {"epoch": int(extra.get("epoch", epoch)),
                         "lr": float(extra.get("lr", 0.0))}}
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    ckptr.close()

    cursor = int(extra.get("batchCursor", 0))
    cur_path = _cursor_file(cfg, epoch)
    if cursor > 0:
        with open(cur_path, "w") as f:
            json.dump({"batchCursor": cursor, "epoch": epoch,
                       "lr": float(extra.get("lr", 0.0))}, f)
    elif os.path.exists(cur_path):
        os.remove(cur_path)                # the epoch ran to completion

    if cfg.saveSubset and cfg.varSubset:
        sub = _subset_params(state.params, cfg.varSubset)
        sub_path = path + "-subset"
        if os.path.exists(sub_path):
            shutil.rmtree(sub_path)
        ckptr2 = ocp.StandardCheckpointer()
        ckptr2.save(sub_path, {"params": sub})
        ckptr2.wait_until_finished()
        ckptr2.close()

    # prune old epochs (reference: Saver max_to_keep, main.py:164)
    keep = cfg.weightsToKeep
    epochs = _epoch_dirs(cfg)
    for e in epochs[:-keep] if keep > 0 else []:
        victim = os.path.abspath(cfg.weightsFile(e))
        if victim != path and os.path.exists(victim):
            shutil.rmtree(victim)
            if os.path.exists(victim + "-subset"):
                shutil.rmtree(victim + "-subset")
            if os.path.exists(_cursor_file(cfg, e)):
                os.remove(_cursor_file(cfg, e))
    return path


def restore_checkpoint(cfg: Config, state, epoch: int, mesh=None):
    """Restore the TrainState saved for ``epoch``; the abstract ``state``
    provides the tree structure/shardings.

    Leaves of the live state that sit uncommitted on the default device
    (e.g. optimizer step counters from an eager ``tx.init``) would be
    restored committed to a single device, clashing with mesh-sharded
    params inside jit — when ``mesh`` is given they are restored
    mesh-replicated instead."""
    from jax.sharding import NamedSharding, PartitionSpec

    path = os.path.abspath(cfg.weightsFile(epoch))
    ckptr = ocp.StandardCheckpointer()

    def to_abstract(leaf):
        s = ocp.utils.to_shape_dtype_struct(leaf)
        if mesh is not None and not isinstance(
                getattr(leaf, "sharding", None), NamedSharding):
            s = jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=NamedSharding(mesh, PartitionSpec()))
        return s

    abstract = {"state": jax.tree.map(to_abstract, state),
                "extra": {"epoch": 0, "lr": 0.0}}
    restored = ckptr.restore(path, abstract)
    ckptr.close()
    return restored["state"]


def latest_epoch(cfg: Config) -> int:
    epochs = _epoch_dirs(cfg)
    return epochs[-1] if epochs else 0


def _subset_params(params: Any, substrings) -> Any:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if any(s in name for s in substrings):
            flat[name] = np.asarray(leaf)
    return flat
