"""Host-side batching and async image loading.

Replaces the reference's loader thread + bounded queues (main.py:374-444)
with a prefetching iterator that overlaps h5 reads and host->device
transfer with device compute (double-buffered ``jax.device_put``).

Static shapes: each batch's questions are trimmed to the batch max length
rounded up to ``cfg.bucketPad`` (the reference trims exactly —
main.py:263-270 — which would force an XLA recompile per distinct length),
and ragged final batches are padded to the full batch size with a loss mask
instead of being fed ragged.
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from mac_network_tpu.config import Config


# ------------------------------------------------------------------ batching

def get_length(data) -> int:
    return len(data["indices"])


def select_indices(data: Dict, indices) -> Dict:
    """Slice every field of a bucket dict (reference: main.py:277-286)."""
    out = {}
    for k, v in data.items():
        if isinstance(v, np.ndarray):
            out[k] = v[indices]
        elif isinstance(v, list):
            out[k] = [v[i] for i in indices]
        else:
            out[k] = v
    return out


def get_batches(data: Dict, batch_size: int, shuffle: bool = True,
                rng: Optional[np.random.RandomState] = None) -> List[Dict]:
    """Shuffled fixed-size batches from one bucket
    (reference: main.py:290-309)."""
    n = get_length(data)
    bs = min(batch_size, n) if n else 0
    idx = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(idx)
    batches = []
    for start in range(0, n, bs if bs else 1):
        sel = idx[start:start + bs]
        if len(sel) == 0:
            continue
        batches.append(select_indices(data, sel))
    return batches


def trim_batch(batch: Dict, pad_multiple: int = 8) -> Dict:
    """Trim question padding to the batch max length, quantized up to
    ``pad_multiple`` for shape stability (reference trims exactly:
    main.py:263-270)."""
    max_len = int(batch["questionLengths"].max())
    if pad_multiple > 1:
        max_len = -(-max_len // pad_multiple) * pad_multiple
    max_len = min(max_len, batch["questions"].shape[1])
    batch = dict(batch)
    batch["questions"] = batch["questions"][:, :max_len]
    return batch


def pad_batch(batch: Dict, batch_size: int) -> Dict:
    """Pad a ragged final batch up to ``batch_size`` with a validity mask so
    jit sees one batch shape per bucket length."""
    n = len(batch["answers"])
    batch = dict(batch)
    mask = np.ones((batch_size,), np.float32)
    if n < batch_size:
        pad = batch_size - n
        mask[n:] = 0.0
        for k in ("questions", "questionLengths", "answers"):
            arr = batch[k]
            batch[k] = np.concatenate(
                [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        for k in ("images", "imageObjectsNum"):
            if k in batch:
                arr = batch[k]
                batch[k] = np.concatenate(
                    [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
    batch["mask"] = mask
    return batch


# --------------------------------------------------------------- image files

class ImageLoader:
    """Loads image-feature slices by imageId from the h5/npy feature cache
    (reference: main.py:313-334).  NLVR maps string ids through the
    {tier}ImgIds.json index (main.py:317-318, 329-331)."""

    def __init__(self, images_info: Dict, cfg: Config):
        self.cfg = cfg
        self.filename = images_info["imagesFilename"]
        self.id2idx = None
        self._file = None
        self._np = None
        ids_file = images_info.get("imageIdsFilename")
        if ids_file:
            with open(ids_file) as f:
                self.id2idx = json.load(f)
        # GQA: per-image valid-object counts ({imageId: objectsNum}) mask
        # the padded detector slots in the read attention
        self.objects_info = None
        info_file = images_info.get("imagesInfoFilename")
        if info_file:
            with open(info_file) as f:
                self.objects_info = json.load(f)

    def open(self):
        if self.filename.endswith(".npy"):
            self._np = np.load(self.filename, mmap_mode="r")
        else:
            import h5py
            self._file = h5py.File(self.filename, "r")

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
        self._np = None

    def _features(self):
        if self._np is not None:
            return self._np
        return self._file["features"]

    def load_batch(self, batch: Dict) -> np.ndarray:
        feats = self._features()
        to_index = (lambda i: self.id2idx[i]) if self.id2idx else (lambda i: i)
        arr = np.stack([feats[to_index(i)] for i in batch["imageIds"]], axis=0)
        if arr.ndim == 3:
            # object features [B, objectsNum, objDim] (GQA): enter the model
            # as a [1, objectsNum, objDim] grid, no CHW transpose
            return np.ascontiguousarray(arr[:, None])
        # CHW -> HWC transpose on host (reference transposes in-graph,
        # model.py:68; the stem wants NHWC on TPU)
        return np.ascontiguousarray(arr.transpose(0, 2, 3, 1))

    def objects_num(self, batch: Dict):
        """Per-example valid-object counts (GQA), or None.  Accepts both
        the plain {imageId: count} layout and the GQA release's
        gqa_objects_info.json entries ({imageId: {"objectsNum": n, ...}})."""
        if self.objects_info is None:
            return None
        def count(i):
            v = self.objects_info[str(i)]
            return v["objectsNum"] if isinstance(v, dict) else v
        return np.asarray([count(i) for i in batch["imageIds"]], np.int32)


# -------------------------------------------------------- HBM feature cache

class HBMFeatureCache:
    """Device-resident feature table: ONE sequential upload of a tier's
    whole h5/npy feature table into HBM; per-batch image assembly becomes
    an on-device gather fed by a [B] int32 index vector (~1KB of H2D)
    instead of a [B,C,H,W] feature slice (~100MB at CLEVR scale).

    TPU-native replacement for the reference's per-batch feed_dict image
    upload (main.py:256-260, 313-334): MAC trains ~25 epochs over the same
    frozen ResNet features, so any tier that fits the HBM budget (CLEVR
    val ~3GB bf16) costs one upload per *run* instead of one per batch —
    per-epoch H2D drops by ~5 orders of magnitude, which also neutralizes
    slow host->device links (PCIe contention, or this environment's
    tunneled TPU at ~40 MB/s post-startup).  The CHW->HWC transpose and
    the computeDtype cast run on-device during the build, off the host
    CPU.  Gated by --hbmData auto|on|off with an --hbmDataGB budget;
    single-host only (each process would need its own table shard).
    """

    SLAB_ROWS = 256                 # rows per upload slab (~100MB f32 CLEVR)

    def __init__(self, image_loader: ImageLoader, cfg: Config):
        self.loader = image_loader
        self.cfg = cfg
        self.table = None           # [N_padded, ...] computeDtype, HWC
        self._obj = False           # GQA object features ([N, slots, dim])
        self.rows = 0               # valid (un-padded) row count
        self.nbytes = 0

    @staticmethod
    def table_bytes(image_loader: ImageLoader, cfg: Config) -> int:
        """Device bytes the cached table would occupy (computeDtype), on
        the SLAB-padded row count actually allocated by build()."""
        feats = image_loader._features()
        shape = feats.shape
        S = HBMFeatureCache.SLAB_ROWS
        n_pad = -(-shape[0] // S) * S
        itemsize = 2 if cfg.computeDtype == "bfloat16" else 4
        return int(np.prod((n_pad,) + tuple(shape[1:]))) * itemsize

    def build(self, budget_bytes: Optional[float] = None) -> None:
        import time as _time

        import jax
        import jax.numpy as jnp
        from jax import lax

        feats = self.loader._features()
        n, shape = feats.shape[0], feats.shape
        dtype = (jnp.bfloat16 if self.cfg.computeDtype == "bfloat16"
                 else jnp.float32)
        self._obj = len(shape) == 3
        if self._obj:                     # [N, slots, dim] — cast only
            row_shape = tuple(shape[1:])
            prep = jax.jit(lambda s: s.astype(dtype))
        else:                             # [N, C, H, W] -> [N, H, W, C]
            row_shape = (shape[2], shape[3], shape[1])
            prep = jax.jit(lambda s: s.transpose(0, 2, 3, 1).astype(dtype))
        S = self.SLAB_ROWS
        n_pad = -(-n // S) * S            # table padded to whole slabs: the
        #                                   tail slab updates in place like
        #                                   any other; gather never indexes
        #                                   the padding
        update = jax.jit(
            lambda tbl, slab, i: lax.dynamic_update_slice_in_dim(
                tbl, slab, i, axis=0),
            donate_argnums=(0,))          # in-place: O(N) total device copy
        t0 = _time.time()

        def host_slab(start):
            slab = np.asarray(feats[start:start + S])
            if slab.shape[0] < S:         # pad the tail slab (one jit shape)
                slab = np.concatenate(
                    [slab,
                     np.zeros((S - slab.shape[0],) + tuple(slab.shape[1:]),
                              slab.dtype)], axis=0)
            return slab

        starts = list(range(0, n, S))
        raw_bytes = int(np.prod(shape)) * np.dtype(feats.dtype).itemsize
        table_bytes = int(np.prod((n_pad,) + row_shape)) * (
            2 if dtype == jnp.bfloat16 else 4)
        # the two-phase gate checks the REMAINING budget (total budget
        # minus bytes already held by previously cached tiers), so a
        # multi-tier run can't transiently exceed --hbmDataGB
        if budget_bytes is None:
            budget_bytes = self.cfg.hbmDataGB * 1e9
        if raw_bytes + table_bytes <= budget_bytes:
            # two-phase: ALL H2D first (pure device_puts, no program
            # executions interleaved), then one transform pass.  Transfers
            # can be much faster before the first compiled-program launch
            # on tunneled/remote device links; on a directly-attached TPU
            # this is simply equivalent.  Transient device memory: raw
            # table + final table (checked against the budget above).
            raw = [jnp.asarray(host_slab(s)) for s in starts]
            table = jnp.zeros((n_pad,) + row_shape, dtype)
            for i, s in enumerate(starts):
                table = update(table, prep(raw[i]), jnp.int32(s))
                raw[i] = None             # free the raw slab as we go
        else:                             # interleaved: O(slab) transient
            table = jnp.zeros((n_pad,) + row_shape, dtype)
            for s in starts:
                table = update(table, prep(jnp.asarray(host_slab(s))),
                               jnp.int32(s))
        table.block_until_ready()
        self.table = table
        self.rows = n
        self.nbytes = table.nbytes
        print(f"HBM feature cache: {n} rows, "
              f"{table.nbytes / 1e9:.2f} GB {self.cfg.computeDtype} "
              f"uploaded in {_time.time() - t0:.1f}s", flush=True)

    def gather(self, image_ids, batch_size: int, put=None):
        """[B, ...] device features for a batch, in the model's layout
        (matches ``ImageLoader.load_batch`` + the computeDtype cast).  A
        ragged tail pads by repeating the last row — masked out by the
        batch's loss mask.  ``put`` optionally re-places the result (e.g.
        a mesh data-axis sharding)."""
        import jax.numpy as jnp

        id2idx = self.loader.id2idx
        to_index = (lambda i: id2idx[i]) if id2idx else (lambda i: i)
        idx = np.asarray([to_index(i) for i in image_ids], np.int32)
        # host-side bounds check: jnp.take clamps out-of-range indices on
        # device, which would silently gather the WRONG row — fail loudly
        # like the streaming h5 path does on a bad imageId
        if idx.size and (idx.min() < 0 or idx.max() >= self.rows):
            bad = idx[(idx < 0) | (idx >= self.rows)][0]
            raise IndexError(
                f"HBM feature cache: image index {int(bad)} out of range "
                f"[0, {self.rows}) for {self.loader.filename}")
        if idx.shape[0] < batch_size:
            idx = np.concatenate(
                [idx, np.repeat(idx[-1:], batch_size - idx.shape[0])])
        out = jnp.take(self.table, jnp.asarray(idx), axis=0)
        if self._obj:                     # [B, 1, slots, dim] grid layout
            out = out[:, None]
        return put(out) if put is not None else out


class ShardedHBMFeatureCache:
    """Feature table sharded over the mesh 'data' axis — the multi-chip /
    multi-host form of :class:`HBMFeatureCache` (which keeps the whole
    table on one device).

    Upload: ``jax.make_array_from_callback`` over a ``P('data')``-sharded
    global array — each process's callback fires only for ITS addressable
    shards, so disk IO, H2D bytes, and HBM all scale with the host count
    (previously ``resolve_hbm_cache`` bailed at ``process_count > 1``,
    leaving the cache unavailable exactly where input pressure is worst).
    The CHW->HWC transpose + computeDtype cast run on-device per shard
    (elementwise, no collectives).

    Gather: a ``shard_map`` kernel — all_gather the per-shard request
    indices (4 bytes/row: tiny), every shard contributes the rows IT owns
    (masked take), ``psum_scatter`` hands each shard its [B/n] output
    rows.  Per batch that moves ~B x row_bytes over ICI instead of
    B x row_bytes from host RAM over PCIe/DCN per process.
    """

    def __init__(self, image_loader: ImageLoader, cfg: Config, mesh):
        self.loader = image_loader
        self.cfg = cfg
        self.mesh = mesh
        self.table = None            # global [N_pad, ...] P('data'), HWC
        self._obj = False
        self.rows = 0
        self.nbytes = 0              # PER-DEVICE table bytes (budget unit)
        self._gather_fns = {}        # global batch size -> jitted shard_map

    @staticmethod
    def per_device_bytes(image_loader: ImageLoader, cfg: Config,
                         mesh) -> int:
        """Steady-state table bytes PER DEVICE (the --hbmDataGB budget is
        per-device HBM).  The raw-f32 upload transient adds ~2x (bf16) on
        top; build() gates on the sum."""
        feats = image_loader._features()
        n_data = mesh.shape["data"]
        n_pad = -(-feats.shape[0] // n_data) * n_data
        itemsize = 2 if cfg.computeDtype == "bfloat16" else 4
        per_row = int(np.prod(feats.shape[1:])) * itemsize
        return n_pad // n_data * per_row

    def build(self, budget_bytes: Optional[float] = None) -> None:
        import time as _time

        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        feats = self.loader._features()
        n, shape = feats.shape[0], feats.shape
        dtype = (jnp.bfloat16 if self.cfg.computeDtype == "bfloat16"
                 else jnp.float32)
        self._obj = len(shape) == 3
        n_data = self.mesh.shape["data"]
        n_pad = -(-n // n_data) * n_data      # rows tile the data axis
        t0 = _time.time()

        def read_shard(index):
            # index: per-shard global slices of [n_pad, ...raw dims]
            r0, r1 = index[0].start or 0, index[0].stop or n_pad
            valid = max(0, min(r1, n) - r0)
            out = np.zeros((r1 - r0,) + tuple(shape[1:]), feats.dtype)
            if valid:
                out[:valid] = feats[r0:r0 + valid]
            return out

        raw_sh = NamedSharding(self.mesh, P(*(("data",) + (None,) *
                                              (len(shape) - 1))))
        raw = jax.make_array_from_callback((n_pad,) + tuple(shape[1:]),
                                           raw_sh, read_shard)
        if self._obj:                     # [N, slots, dim] — cast only
            prep = lambda t: t.astype(dtype)
            out_sh = raw_sh
        else:                             # [N, C, H, W] -> [N, H, W, C]
            prep = lambda t: t.transpose(0, 2, 3, 1).astype(dtype)
            out_sh = NamedSharding(self.mesh, P("data", None, None, None))
        table = jax.jit(prep, out_shardings=out_sh)(raw)
        table.block_until_ready()
        del raw
        self.table = table
        self.rows = n
        self.nbytes = table.nbytes // n_data
        if jax.process_index() == 0:
            print(f"HBM feature cache (sharded x{n_data}): {n} rows, "
                  f"{table.nbytes / 1e9:.2f} GB {self.cfg.computeDtype} "
                  f"({self.nbytes / 1e9:.2f} GB/device) uploaded in "
                  f"{_time.time() - t0:.1f}s", flush=True)

    def _build_gather(self, B: int):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        Nl = self.table.shape[0] // n_data
        fdims = self.table.ndim - 1

        def kernel(tbl, idx):             # tbl [Nl, ...], idx [B/n]
            idx_all = lax.all_gather(idx, "data", tiled=True)   # [B]
            base = lax.axis_index("data") * Nl
            loc = idx_all - base
            ok = (loc >= 0) & (loc < Nl)
            rows = jnp.take(tbl, jnp.clip(loc, 0, Nl - 1), axis=0)
            rows = jnp.where(ok.reshape((B,) + (1,) * fdims), rows,
                             jnp.zeros((), rows.dtype))
            return lax.psum_scatter(rows, "data", scatter_dimension=0,
                                    tiled=True)                 # [B/n, ...]

        spec_t = P(*(("data",) + (None,) * fdims))
        fn = shard_map(kernel, mesh=self.mesh,
                       in_specs=(spec_t, P("data")),
                       out_specs=spec_t, check_vma=False)
        return jax.jit(fn)

    def gather(self, image_ids, batch_size: int, put=None):
        """[B_global, ...] sharded P('data') device features for a batch.
        ``image_ids`` are this PROCESS's local rows of the global batch
        (under multi-host the prefetcher slices per process); every
        process calls this collectively.  ``put`` is ignored — the result
        is born on the mesh."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        id2idx = self.loader.id2idx
        to_index = (lambda i: id2idx[i]) if id2idx else (lambda i: i)
        idx = np.asarray([to_index(i) for i in image_ids], np.int32)
        if idx.size and (idx.min() < 0 or idx.max() >= self.rows):
            bad = idx[(idx < 0) | (idx >= self.rows)][0]
            raise IndexError(
                f"HBM feature cache: image index {int(bad)} out of range "
                f"[0, {self.rows}) for {self.loader.filename}")
        per_process = batch_size // max(1, jax.process_count())
        if idx.shape[0] < per_process:
            idx = np.concatenate(
                [idx, np.repeat(idx[-1:], per_process - idx.shape[0])])
        g_idx = jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P("data")), idx, (batch_size,))
        fn = self._gather_fns.get(batch_size)
        if fn is None:
            fn = self._gather_fns[batch_size] = self._build_gather(batch_size)
        out = fn(self.table, g_idx)
        if self._obj:                     # [B, 1, slots, dim] grid layout
            out = out[:, None]
        return out


def resolve_hbm_cache(runner_caches: Dict, image_loader: ImageLoader,
                      cfg: Config, process_count: int = 1, mesh=None):
    """Return (and lazily build) the HBM cache for a tier's feature file,
    or None when disabled / over budget.  ``runner_caches`` maps
    filename -> cache and persists across epochs so each tier uploads
    once per run; the --hbmDataGB budget is PER DEVICE and covers the
    total of all cached tiers.

    Single device: the slab-tuned :class:`HBMFeatureCache`.  Multi-host —
    or a single-host table that only fits when split over the mesh's data
    axis — :class:`ShardedHBMFeatureCache` (each process uploads its row
    range; per-batch assembly is an all_gather(idx)/psum_scatter(rows)
    shard_map kernel)."""
    mode = getattr(cfg, "hbmData", "off")
    if mode == "off":
        return None
    n_data = int(mesh.shape["data"]) if mesh is not None else 1
    if process_count > 1 and (mesh is None or n_data % process_count):
        return None                       # data axis must tile the hosts
    cached = runner_caches.get(image_loader.filename)
    if cached is not None:
        return cached
    used = sum(c.nbytes for c in runner_caches.values())
    remaining = cfg.hbmDataGB * 1e9 - used
    if process_count == 1:
        need = HBMFeatureCache.table_bytes(image_loader, cfg)
        if need <= remaining or mode == "on":
            cache = HBMFeatureCache(image_loader, cfg)
            cache.build(budget_bytes=remaining)
            runner_caches[image_loader.filename] = cache
            return cache
        # auto + over budget: fall through to the sharded form, which
        # needs only table/n_data per device
    if mesh is None or (n_data < 2 and process_count == 1):
        return None
    per_dev = ShardedHBMFeatureCache.per_device_bytes(image_loader, cfg,
                                                      mesh)
    # the raw-f32 upload transient coexists with the final table
    itemsize = 2 if cfg.computeDtype == "bfloat16" else 4
    transient = per_dev * (1 + 4 // itemsize)
    if mode == "auto" and transient > remaining:
        return None
    cache = ShardedHBMFeatureCache(image_loader, cfg, mesh)
    cache.build(budget_bytes=remaining)
    runner_caches[image_loader.filename] = cache
    return cache


# ---------------------------------------------------------------- prefetcher

class PrefetchIterator:
    """Background thread loads + preps the next batches while the device
    computes the current one (replacement for the reference's loader thread,
    main.py:374-444).  Yields fully host-prepped batch dicts; device_put
    happens in the consumer (or via shard_batch for multi-chip)."""

    def __init__(self, batches: List[Dict], image_loader: Optional[ImageLoader],
                 cfg: Config, train: bool, depth: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 hbm_cache: Optional[HBMFeatureCache] = None):
        self.batches = batches
        self.loader = image_loader
        # with an HBM cache the worker skips the h5 read + transpose + cast
        # entirely: the consumer gathers features on-device by imageIds
        self.hbm_cache = hbm_cache
        self.cfg = cfg
        self.train = train
        self.process_index = process_index
        self.process_count = process_count
        self.q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.error = None

    def _prep(self, batch: Dict) -> Dict:
        cfg = self.cfg
        batch = trim_batch(batch, cfg.bucketPad)
        if self.process_count > 1:
            # multi-host: this process prepares (and reads from disk) ONLY
            # its rows of the global batch; the consumer assembles global
            # arrays via assemble_global (parallel/multihost.py).  With a
            # (sharded) HBM cache the feature read is skipped — the
            # consumer gathers on-device by the local imageIds
            from mac_network_tpu.parallel.multihost import host_local_batch
            n_valid = len(batch["answers"])
            local = host_local_batch(
                batch, cfg.batchSize, self.process_index, self.process_count,
                image_loader=self.loader, compute_dtype=cfg.computeDtype,
                load_images=self.hbm_cache is None)
            local["instances"] = [batch["instances"][r]
                                  for r in local["localRows"]]
            local["nValidGlobal"] = min(n_valid, cfg.batchSize)
            return local
        if self.loader is not None and self.hbm_cache is not None:
            n_obj = self.loader.objects_num(batch)
            if n_obj is not None:
                batch["imageObjectsNum"] = n_obj
        elif self.loader is not None:
            images = self.loader.load_batch(batch)
            n_obj = self.loader.objects_num(batch)
            if n_obj is not None:
                batch["imageObjectsNum"] = n_obj
            if cfg.computeDtype == "bfloat16":
                # cast on the host: halves host->device bytes for the image
                # features (the dominant transfer; the model casts to the
                # compute dtype on-device anyway)
                import ml_dtypes
                images = images.astype(ml_dtypes.bfloat16)
            batch["images"] = images
        batch = pad_batch(batch, cfg.batchSize)
        return batch

    def _run(self):
        try:
            for batch in self.batches:
                self.q.put(self._prep(batch))
        except Exception as e:                      # surfaced in __next__
            self.error = e
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator[Dict]:
        self.thread.start()
        while True:
            item = self.q.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item
