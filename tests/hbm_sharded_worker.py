"""Worker for the true 2-process sharded-HBM-cache parity test
(test_multihost.test_two_process_sharded_hbm_gather_parity).

Run as:  python tests/hbm_sharded_worker.py <idx> <count> <port> <out> <root>

Each process forces 4 virtual CPU devices, joins the jax.distributed
cluster, builds the P('data')-sharded feature table over the global
8-device mesh (uploading ONLY its addressable row shards — the
make_array_from_callback path), gathers a global batch from its LOCAL
imageIds, and checks every addressable shard of the result row-for-row
against the streaming h5 loader."""

import json
import os
import sys


def main():
    idx, count = int(sys.argv[1]), int(sys.argv[2])
    port, out_path, root = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import numpy as np
    from mac_network_tpu.config import Config
    from mac_network_tpu.parallel.multihost import (local_rows,
                                                    maybe_initialize)

    dist_cfg = Config()
    dist_cfg.coordinatorAddress = f"localhost:{port}"
    dist_cfg.processCount = count
    dist_cfg.processIndex = idx
    assert maybe_initialize(dist_cfg) is True
    assert jax.process_count() == count

    from pathlib import Path
    from mac_network_tpu.data import Preprocesser
    from mac_network_tpu.data.loader import (ImageLoader,
                                             ShardedHBMFeatureCache,
                                             resolve_hbm_cache)
    from mac_network_tpu.parallel import make_mesh
    from tests.test_hbm_cache import make_cfg

    cfg = make_cfg(Path(root), meshData=4 * count)
    pp = Preprocesser(cfg)
    data, _, _ = pp.preprocessData()
    loader = ImageLoader(data["main"]["train"]["images"], cfg)
    loader.open()
    try:
        mesh = make_mesh(cfg)
        cache = resolve_hbm_cache({}, loader, cfg, process_count=count,
                                  mesh=mesh)
        assert isinstance(cache, ShardedHBMFeatureCache), type(cache)

        B = 8
        global_ids = [3, 0, 7, 3, 11, 5, 2, 9]
        rows, _ = local_rows(B, B, idx, count)
        local_ids = [global_ids[r] for r in rows]
        got = cache.gather(local_ids, batch_size=B)

        # streaming reference for the FULL global batch (test-only read)
        want = loader.load_batch({"imageIds": global_ids}).astype(
            np.float32)
        checked = 0
        for shard in got.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          want[shard.index[0]])
            checked += 1
        assert checked == 4, checked            # one shard per local device
    finally:
        loader.close()

    with open(out_path, "w") as f:
        json.dump({"process": idx, "checked_shards": checked}, f)


if __name__ == "__main__":
    main()
