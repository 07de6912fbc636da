"""serve.py end-to-end: train a tiny model, then answer ad-hoc questions
from a checkpoint through the serving CLI."""

import json
import os

import pytest


def test_resolve_engine():
    """auto picks the fused engine only in its measured winning regime:
    small batch (<= crossover) on a real TPU (BENCH_r03 serve_sweep)."""
    from serve import resolve_engine, SMALL_BATCH_CROSSOVER
    from mac_network_tpu.config import Config

    cfg = Config()
    assert cfg.servingEngine == "auto"
    cfg.batchSize = 8
    assert resolve_engine(cfg, "tpu") == "pallas"
    assert resolve_engine(cfg, "cpu") == "xla"       # interpret mode never
    cfg.batchSize = SMALL_BATCH_CROSSOVER
    assert resolve_engine(cfg, "tpu") == "pallas"
    cfg.batchSize = SMALL_BATCH_CROSSOVER + 1
    assert resolve_engine(cfg, "tpu") == "xla"
    # explicit choices override the heuristic
    cfg.servingEngine = "pallas"
    assert resolve_engine(cfg, "cpu") == "pallas"
    cfg.servingEngine = "xla"
    cfg.batchSize = 1
    assert resolve_engine(cfg, "tpu") == "xla"
    # legacy --usePallas wins over everything
    cfg.usePallas = True
    assert resolve_engine(cfg, "cpu") == "pallas"


def test_serve_roundtrip(tmp_path):
    from main import main
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    from tests.test_train_e2e import make_cfg
    import serve

    write_synthetic_dataset(str(tmp_path), n_train=32, n_val=16, n_test=16,
                            dims=(16, 5, 5))
    cfg = make_cfg(tmp_path, expName="srv", epochs=1, getPreds=False,
                   evalTrain=False, batchSize=8)
    main(cfg)

    # ad-hoc requests against the val tier's feature file
    requests = [
        {"question": "What color is the large cube?", "imageId": 0},
        {"question": "How many red small objects are there?", "imageId": 1},
        {"question": "Is there a blue sphere?", "imageId": 2},
    ]
    inp = tmp_path / "req.json"
    outp = tmp_path / "ans.json"
    with open(inp, "w") as f:
        json.dump(requests, f)

    cfg2 = make_cfg(tmp_path, expName="srv", train=False, restore=True,
                    batchSize=8, getPreds=False, evalTrain=False)
    stats = serve.serve(cfg2, str(inp), str(outp), tier="val")
    assert stats["count"] == 3

    with open(outp) as f:
        answers = json.load(f)
    assert len(answers) == 3
    assert all("prediction" in a and isinstance(a["prediction"], str)
               for a in answers)

    # --getAtt: attention maps exported per instance (reference returns
    # attention wherever getAtt is set, model.py:732-760); reuse the ckpt
    outp2 = tmp_path / "ans_att.json"
    cfg3 = make_cfg(tmp_path, expName="srv", train=False, restore=True,
                    batchSize=8, getPreds=False, evalTrain=False, getAtt=True)
    stats = serve.serve(cfg3, str(inp), str(outp2), tier="val", get_att=True)
    assert stats["count"] == 3
    with open(outp2) as f:
        answers = json.load(f)
    for a in answers:
        att = a["attentions"]
        assert set(att) >= {"question", "kb"}
        # one map per reasoning step, each a plain nested list
        assert len(att["question"]) == cfg3.netLength
        assert len(att["kb"]) == cfg3.netLength
        assert isinstance(att["kb"][0], list)

    # fused engine has no attention outputs: getAtt+usePallas falls back to
    # the XLA path instead of silently dropping the attention maps
    outp3 = tmp_path / "ans_att_pallas.json"
    cfg4 = make_cfg(tmp_path, expName="srv", train=False, restore=True,
                    batchSize=8, getPreds=False, evalTrain=False,
                    getAtt=True, usePallas=True)
    serve.serve(cfg4, str(inp), str(outp3), tier="val", get_att=True)
    with open(outp3) as f:
        answers = json.load(f)
    assert all("attentions" in a for a in answers)


def test_serve_mesh_sharded(tmp_path):
    """--meshData shards serving over the device mesh (GSPMD): predictions
    must be identical to the single-device run, and a batchSize that does
    not divide the mesh axis is rejected loudly."""
    import jax
    import serve
    from main import main
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    from tests.test_train_e2e import make_cfg

    assert jax.device_count() >= 8
    write_synthetic_dataset(str(tmp_path), n_train=32, n_val=16, n_test=16,
                            dims=(16, 5, 5))
    cfg = make_cfg(tmp_path, expName="srvmesh", epochs=1, getPreds=False,
                   evalTrain=False, batchSize=8)
    main(cfg)

    # val features hold n_val // 2 = 8 images (synthetic.py)
    requests = [{"question": "What color is the large cube?",
                 "imageId": i % 8} for i in range(10)]
    inp = tmp_path / "req.json"
    with open(inp, "w") as f:
        json.dump(requests, f)

    def run(name, **over):
        cfg2 = make_cfg(tmp_path, expName="srvmesh", train=False,
                        restore=True, batchSize=8, getPreds=False,
                        evalTrain=False, **over)
        outp = tmp_path / f"{name}.json"
        serve.serve(cfg2, str(inp), str(outp), tier="val")
        with open(outp) as f:
            return [a["prediction"] for a in json.load(f)]

    single = run("single")
    sharded = run("mesh", meshData=8)
    assert sharded == single

    # the fused Pallas engine composes with mesh serving (shard_map over
    # 'data'): same predictions as the single-device fused engine
    pallas_single = run("pallas_single", usePallas=True)
    pallas_sharded = run("mesh_pallas", meshData=8, usePallas=True)
    assert pallas_sharded == pallas_single

    import pytest as _pytest
    cfg_bad = make_cfg(tmp_path, expName="srvmesh", train=False,
                       restore=True, batchSize=6, getPreds=False,
                       evalTrain=False, meshData=8)
    with _pytest.raises(SystemExit, match="multiple of the data mesh"):
        serve.serve(cfg_bad, str(inp), str(tmp_path / "bad.json"),
                    tier="val")


def test_resolve_engine_probe(tmp_path):
    """The self-calibrating probe overrides the static v5e crossover: on a
    platform whose measured timings disagree with the heuristic, the timed
    winner is picked — and cached, so the (expensive, second-compile)
    probe runs once per device kind + shape."""
    from serve import resolve_engine, SMALL_BATCH_CROSSOVER
    from mac_network_tpu.config import Config

    cache = str(tmp_path / "engine_cache.json")
    cfg = Config()
    cfg.batchSize = 8                       # heuristic regime: pallas

    # a platform where the fused engine LOSES at small batch
    t = {"xla": 1.0, "pallas": 2.0}
    calls = []

    def timer(name):
        calls.append(name)
        return t[name]

    assert resolve_engine(cfg, "tpu", timer=timer, device_kind="TPU v9",
                          cache_path=cache) == "xla"
    assert sorted(calls) == ["pallas", "xla"]

    # cached: a second resolve never re-times
    def boom(name):
        raise AssertionError("probe must not re-run on a cache hit")
    assert resolve_engine(cfg, "tpu", timer=boom, device_kind="TPU v9",
                          cache_path=cache) == "xla"

    # a different shape probes again — and can pick the other engine
    cfg.batchSize = SMALL_BATCH_CROSSOVER * 4   # heuristic regime: xla
    t = {"xla": 2.0, "pallas": 1.0}
    assert resolve_engine(cfg, "tpu", timer=timer, device_kind="TPU v9",
                          cache_path=cache) == "pallas"

    # explicit choices and non-TPU backends bypass the probe entirely
    assert resolve_engine(cfg, "cpu", timer=boom, device_kind="cpu",
                          cache_path=cache) == "xla"
    cfg.servingEngine = "xla"
    assert resolve_engine(cfg, "tpu", timer=boom, device_kind="TPU v9",
                          cache_path=cache) == "xla"
    cfg.usePallas = True
    assert resolve_engine(cfg, "tpu", timer=boom, device_kind="TPU v9",
                          cache_path=cache) == "pallas"


def test_resolve_engine_probes_dispatch_depth(tmp_path):
    """--requestsPerDispatch changes the timed path AND the cache key:
    the K-deep scan's engine ranking can flip relative to single-batch
    predict (BENCH_r04 b1: xla_k8 0.412 ms beats pallas_k8 0.516 while
    plain xla 0.945 loses to nothing at B=1), so a K=8 serve must probe
    and cache independently of a K=1 serve at the same shape."""
    from serve import resolve_engine
    from mac_network_tpu.config import Config

    cache = str(tmp_path / "engine_cache.json")
    cfg = Config()
    cfg.batchSize = 1

    # single-batch ranking: pallas wins
    t1 = {"xla": 2.0, "pallas": 1.0}
    assert resolve_engine(cfg, "tpu", timer=lambda n: t1[n],
                          device_kind="TPU v9", cache_path=cache) == "pallas"

    # K-deep ranking flips: xla wins the scan path.  Same shape, K=8 —
    # must NOT hit the K=1 cache entry.
    t8 = {"xla": 1.0, "pallas": 2.0}
    assert resolve_engine(cfg, "tpu", timer=lambda n: t8[n],
                          device_kind="TPU v9", cache_path=cache,
                          dispatch_depth=8) == "xla"

    # both entries cached independently
    def boom(name):
        raise AssertionError("probe must not re-run on a cache hit")
    assert resolve_engine(cfg, "tpu", timer=boom, device_kind="TPU v9",
                          cache_path=cache) == "pallas"
    assert resolve_engine(cfg, "tpu", timer=boom, device_kind="TPU v9",
                          cache_path=cache, dispatch_depth=8) == "xla"


def test_serve_k_deep_dispatch(tmp_path):
    """--requestsPerDispatch K stacks K batches into one lax.scan dispatch
    (the serving analogue of --stepsPerDispatch): predictions must be
    identical to the per-batch path, including a ragged tail that falls
    back to per-batch dispatch, and compose with mesh sharding."""
    import json as _json

    import serve
    from main import main
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    from tests.test_train_e2e import make_cfg

    write_synthetic_dataset(str(tmp_path), n_train=32, n_val=16, n_test=16,
                            dims=(16, 5, 5))
    cfg = make_cfg(tmp_path, expName="srvk", epochs=1, getPreds=False,
                   evalTrain=False, batchSize=8)
    main(cfg)

    # 4 batches of 4 + a ragged tail of 2 -> one K=4 scan + 2 per-batch
    requests = [{"question": f"Is object {i} red?", "imageId": i % 8}
                for i in range(18)]
    inp = tmp_path / "req.json"
    with open(inp, "w") as f:
        _json.dump(requests, f)

    def run(name, **over):
        cfg2 = make_cfg(tmp_path, expName="srvk", train=False,
                        restore=True, batchSize=4, getPreds=False,
                        evalTrain=False, **over)
        outp = tmp_path / f"{name}.json"
        stats = serve.serve(cfg2, str(inp), str(outp), tier="val")
        assert stats["count"] == 18
        with open(outp) as f:
            return [a["prediction"] for a in _json.load(f)]

    per_batch = run("k1", requestsPerDispatch=1)
    k_deep = run("k4", requestsPerDispatch=4)
    assert k_deep == per_batch
    mesh_k = run("k4mesh", requestsPerDispatch=4, meshData=4)
    assert mesh_k == per_batch
