"""--fusedTrain one-shot engine probe (train/engine_probe.py) and the
forced-serving-engine warning (serve.py).

The serving path has self-calibrated since round 3; these cover the
TRAINING analogue — at some operating points (GQA 100x2048, BENCH_r04)
the fused Pallas training pair loses to XLA, so --fusedTrain probes one
step through each engine and uses the winner, cached per
(device kind, shape)."""

import json

import pytest

from mac_network_tpu.config import Config
from mac_network_tpu.train.engine_probe import (_probe_key,
                                                resolve_train_engine)


class _Model:
    name = "xla"


class _Fused:
    name = "fused"


def test_probe_picks_faster_and_caches(tmp_path):
    cache = str(tmp_path / "train_engine_cache.json")
    cfg = Config()
    cfg.fusedTrain = True

    # fused wins
    times = {"fused": 1.0, "xla": 2.0}
    pick = resolve_train_engine(
        cfg, _Model(), _Fused, timer=lambda m: times[m.name],
        device_kind="TPU v9", cache_path=cache)
    assert isinstance(pick, _Fused)

    # cache hit: timer must not re-run
    def boom(m):
        raise AssertionError("probe must not re-run on a cache hit")
    pick = resolve_train_engine(cfg, _Model(), _Fused, timer=boom,
                                device_kind="TPU v9", cache_path=cache)
    assert isinstance(pick, _Fused)

    with open(cache) as f:
        entry = json.load(f)[_probe_key(cfg, "TPU v9")]
    assert entry["engine"] == "fused"
    assert entry["fused_s"] == 1.0 and entry["xla_s"] == 2.0


def test_probe_routes_to_xla_when_fused_loses(tmp_path):
    """The GQA case: a forced --fusedTrain lands on the XLA step when the
    measured step time says so (round-4 VERDICT weak #4)."""
    cache = str(tmp_path / "train_engine_cache.json")
    cfg = Config()
    cfg.fusedTrain = True
    cfg.dataset = "GQA"
    cfg.imageDims = [1, 100, 2048]

    times = {"fused": 2.0, "xla": 1.0}
    model = _Model()
    pick = resolve_train_engine(
        cfg, model, _Fused, timer=lambda m: times[m.name],
        device_kind="TPU v9", cache_path=cache)
    assert pick is model

    # a different shape must NOT hit the GQA cache entry
    cfg2 = Config()
    cfg2.fusedTrain = True          # CLEVR dims: separate key
    times2 = {"fused": 1.0, "xla": 2.0}
    pick2 = resolve_train_engine(
        cfg2, model, _Fused, timer=lambda m: times2[m.name],
        device_kind="TPU v9", cache_path=cache)
    assert isinstance(pick2, _Fused)


def test_probe_opt_outs_keep_fused(tmp_path):
    """No timer (CPU, multi-host) or --fusedTrainProbe=false: the explicit
    flag keeps its engine with zero probe overhead."""
    cfg = Config()
    cfg.fusedTrain = True
    pick = resolve_train_engine(cfg, _Model(), _Fused, timer=None)
    assert isinstance(pick, _Fused)

    cfg.fusedTrainProbe = False
    def boom(m):
        raise AssertionError("probe must not run when opted out")
    pick = resolve_train_engine(cfg, _Model(), _Fused, timer=boom,
                                cache_path=str(tmp_path / "c.json"))
    assert isinstance(pick, _Fused)


def test_forced_serving_engine_warns_from_cache(tmp_path, capsys):
    """Forced --usePallas is honored, but when a previous auto-probe
    already measured XLA faster at this exact (device kind, shape) the
    serve path says so loudly instead of silently losing ~13% qps."""
    from serve import _probe_key as serve_key
    from serve import resolve_engine

    cache = str(tmp_path / "engine_cache.json")
    cfg = Config()
    cfg.batchSize = 64

    # seed the cache via an auto-probe where xla wins
    t = {"xla": 1.0, "pallas": 2.0}
    assert resolve_engine(cfg, "tpu", timer=lambda n: t[n],
                          device_kind="TPU v9", cache_path=cache) == "xla"

    # forced pallas: honored, but warned
    cfg.usePallas = True
    capsys.readouterr()
    assert resolve_engine(cfg, "tpu", device_kind="TPU v9",
                          cache_path=cache) == "pallas"
    err = capsys.readouterr().err
    assert "WARNING" in err and "xla" in err

    # no cache entry for an unprobed shape: no warning
    cfg.batchSize = 128
    capsys.readouterr()
    assert resolve_engine(cfg, "tpu", device_kind="TPU v9",
                          cache_path=cache) == "pallas"
    assert "WARNING" not in capsys.readouterr().err
