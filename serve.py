"""Offline/online serving CLI — beyond-reference addition for production
inference.

Loads a trained checkpoint and answers questions against precomputed image
features, through either the fused Pallas engine (--usePallas) or the
hoisted XLA path, at fixed batch shapes (pad + mask) so everything runs
from the compilation cache.

Input JSON: a list of {"question": str, "imageId": int-or-str}.
Output JSON: the list with "prediction" (and optionally attention maps)
added, in input order.

Usage:
    python serve.py --expName exp1 --restore @configs/args.txt \
        --dataBasedir /data --input questions.json --output answers.json \
        [--tier val] [--batchSize 256 --computeDtype bfloat16 --usePallas]

Vocabulary dictionaries come from the experiment's generated pickles
(questionDict.pkl / answerDict.pkl — reference layout, preprocess.py:253-260),
so serving needs no raw dataset files beyond the image features.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time

import numpy as np

# Measured on TPU v5e, flagship netLength=16 bf16 (BENCH_r03 serve_sweep;
# min latency over 5 trials x 100 iters — single-trial numbers vary +-30%
# through the tunnel): the fused engine beats XLA at B=16 (1.01 vs
# 1.08 ms) and B=32 (1.63 vs 1.69), ties within noise at B<=8 (0.72 vs
# 0.70 at B=1), and loses from B=64 up (2.93 vs 2.74) where the
# recurrence turns MXU-bound and XLA runs at the matmul roofline.
# Fallback only: with --servingProbe (the default) engine=auto times both
# paths at the requested shape and caches the winner per device kind.
SMALL_BATCH_CROSSOVER = 32


def _engine_cache_path() -> str:
    import os
    d = os.path.join(os.path.expanduser("~"), ".cache", "mac_tpu_xla")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "serve_engine_cache.json")


def _probe_key(cfg, device_kind: str, dispatch_depth: int = 1) -> str:
    H, W, C = cfg.imageDims
    return (f"{device_kind}|B{cfg.batchSize}|T{cfg.netLength}|d{cfg.memDim}"
            f"|S{H * W}|{cfg.computeDtype}"
            + (f"|K{dispatch_depth}" if dispatch_depth > 1 else ""))


def resolve_engine(cfg, backend: str, timer=None, device_kind: str = "",
                   cache_path: str = None, dispatch_depth: int = 1) -> str:
    """--servingEngine {auto,xla,pallas}; --usePallas forces pallas.

    ``auto`` on a real TPU self-calibrates: ``timer(engine) -> seconds``
    times each path at the requested batch shape (serve() passes a
    2-warmup/3-rep micro-probe over the jitted predict fns); the winner is
    cached per (device kind, batch, netLength, memDim, KB size, dtype,
    dispatch depth) in ~/.cache/mac_tpu_xla/serve_engine_cache.json so
    the probe — and its second compile — is one-shot per platform+shape.
    ``dispatch_depth`` is the --requestsPerDispatch K the serve loop will
    actually run: the engine ranking can flip between single-batch predict
    and the K-deep scan (BENCH_r04 b1: xla_k8 0.412 vs pallas_k8
    0.516 ms), so serve() hands the probe a timer over the K-deep path and
    the cache keys the two modes separately.  Without a timer (CPU,
    --no-servingProbe, unsupported config) the v5e-measured
    SMALL_BATCH_CROSSOVER heuristic applies."""
    def _warn_if_cached_loser(forced: str):
        # a FORCED engine is honored, but if a previous auto-probe already
        # measured this exact (device kind, shape) and the other engine
        # won, say so loudly — e.g. forced --usePallas at GQA's 100x2048
        # operating point costs ~13% qps (BENCH_r04 gqa) with no signal
        try:
            with open(cache_path or _engine_cache_path()) as f:
                probed = json.load(f).get(
                    _probe_key(cfg, device_kind, dispatch_depth))
        except (OSError, ValueError):
            probed = None
        if probed and probed.get("engine") not in (None, forced):
            print(f"serve: WARNING — forced engine '{forced}' but the "
                  f"probe measured {probed['engine']} faster here "
                  f"(xla {probed.get('xla_s', 0) * 1e3:.2f} ms vs pallas "
                  f"{probed.get('pallas_s', 0) * 1e3:.2f} ms); consider "
                  f"--servingEngine auto", file=sys.stderr)

    if cfg.usePallas:
        _warn_if_cached_loser("pallas")
        return "pallas"
    if cfg.servingEngine != "auto":
        _warn_if_cached_loser(cfg.servingEngine)
        return cfg.servingEngine
    if backend != "tpu":
        return "xla"                   # interpret-mode pallas never wins
    if timer is not None:
        path = cache_path or _engine_cache_path()
        key = _probe_key(cfg, device_kind, dispatch_depth)
        try:
            with open(path) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            cache = {}
        if key in cache:
            return cache[key]["engine"]
        t_xla = timer("xla")
        t_pallas = timer("pallas")
        choice = "pallas" if t_pallas < t_xla else "xla"
        cache[key] = {"engine": choice, "xla_s": t_xla,
                      "pallas_s": t_pallas}
        try:
            with open(path, "w") as f:
                json.dump(cache, f, indent=1)
        except OSError:
            pass
        print(f"serve: probe {key}: xla {t_xla * 1e3:.2f} ms, pallas "
              f"{t_pallas * 1e3:.2f} ms -> {choice}", file=sys.stderr)
        return choice
    return "pallas" if cfg.batchSize <= SMALL_BATCH_CROSSOVER else "xla"


def serve(cfg, input_path: str, output_path: str, tier: str = "val",
          get_att: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from mac_network_tpu.data.loader import ImageLoader
    from mac_network_tpu.data.preprocess import tokenize, vectorize_2d
    from mac_network_tpu.data.symbol_dict import SymbolDict
    from mac_network_tpu.models import MACNetwork
    from mac_network_tpu.train import (
        create_train_state, make_eval_step, make_optimizer)
    from mac_network_tpu.train.checkpoint import (
        latest_epoch, restore_checkpoint)

    # vocabularies from the experiment's generated pickles
    with open(cfg.questionDictFile(), "rb") as f:
        question_dict: SymbolDict = pickle.load(f)
    with open(cfg.answerDictFile(), "rb") as f:
        answer_dict: SymbolDict = pickle.load(f)
    if cfg.ansEmbMod == "SHARED":
        with open(cfg.qaDictFile(), "rb") as f:
            question_dict = pickle.load(f)
    cfg.questionWordsNum = question_dict.getNumSymbols()
    cfg.answerWordsNum = answer_dict.getNumSymbols()

    with open(input_path) as f:
        requests = json.load(f)

    # encode questions (native tokenizer when available)
    from mac_network_tpu import native
    texts = [r["question"] for r in requests]
    token_lists = native.tokenize_batch(texts) or [tokenize(t) for t in texts]
    encoded = [question_dict.encodeSequence(t) for t in token_lists]
    questions, lengths = vectorize_2d(encoded, pad_multiple=cfg.bucketPad)

    # model + restored state (embedding init shapes only; weights replaced)
    rng = np.random.RandomState(0)
    emb_init = {"q": rng.randn(cfg.questionWordsNum - 1,
                               cfg.wrdEmbDim).astype(np.float32), "a": None}
    if cfg.ansEmbMod == "SHARED":
        emb_init = {"qa": emb_init["q"],
                    "ansMap": np.zeros((cfg.answerWordsNum,), np.int32)}
    elif cfg.ansEmbMod == "BOTH":
        emb_init["a"] = rng.randn(cfg.answerWordsNum,
                                  cfg.wrdEmbDim).astype(np.float32)
    model = MACNetwork(cfg, emb_init)

    H, W, C = cfg.imageDims
    B = cfg.batchSize
    dummy_q = jnp.zeros((B, 8), jnp.int32)
    dummy_len = jnp.ones((B,), jnp.int32)
    dummy_img = jnp.zeros((B, H, W, C), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy_q, dummy_len, dummy_img, train=False)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    epoch = cfg.restoreEpoch or latest_epoch(cfg)
    state = restore_checkpoint(cfg, state, epoch)
    params = state.eval_params(cfg.useEMA)

    # guards main.py has (main.py:40-44); pad+mask makes any batchSize work
    if cfg.batchSize < 1:
        raise SystemExit(f"--batchSize {cfg.batchSize} must be >= 1")

    # multi-chip serving: --meshData N (and/or --meshModel M) shards the
    # batch over the data axis of a device mesh — GSPMD inserts the ICI
    # collectives for the XLA glue; the fused Pallas engine partitions its
    # kernels over the same axis with shard_map (each device runs its
    # batch shard — no KB-sized operand is ever gathered), so --usePallas
    # and mesh serving compose.  Opt-in (default stays single-device).
    mesh = None
    if cfg.meshData > 1 or cfg.meshModel > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from mac_network_tpu.parallel import make_mesh, shard_params
        mesh = make_mesh(cfg)
        n_data = mesh.shape["data"]
        if B % n_data:
            raise SystemExit(
                f"--batchSize {B} must be a multiple of the data mesh "
                f"axis ({n_data})")
        params = shard_params(params, mesh)
        if state.batch_stats:
            # BN statistics ride along replicated: mixing single-device-
            # committed arrays with mesh-sharded params in one jit raises
            # an incompatible-devices error
            state = state.replace(batch_stats=jax.device_put(
                state.batch_stats, NamedSharding(mesh, PartitionSpec())))
        print(f"serve: mesh serving over {dict(mesh.shape)}",
              file=sys.stderr)
    elif len(jax.devices()) > 1:
        print(f"serve: single-device serving on {jax.devices()[0]} "
              f"({len(jax.devices())} devices visible; pass --meshData N "
              f"to shard the batch over a mesh)", file=sys.stderr)

    # hard constraints on the fused engine: the config must be inside the
    # kernel envelope, and getAtt on controlFeedPrev keeps its control
    # recurrence in-kernel so attention maps need the XLA path (reference
    # returns attention wherever getAtt is set, model.py:732-760)
    from mac_network_tpu.ops.pallas import (
        FusedMACEngine, supports_fused_config)
    pallas_ok = supports_fused_config(cfg)
    if not pallas_ok and (cfg.usePallas or cfg.servingEngine == "pallas"):
        print("serve: config outside fused envelope; XLA path",
              file=sys.stderr)
    if get_att and cfg.controlFeedPrev:
        if cfg.usePallas or cfg.servingEngine == "pallas":
            print("serve: --getAtt on a controlFeedPrev config requires "
                  "the XLA path; ignoring --usePallas", file=sys.stderr)
        pallas_ok = False

    if mesh is not None:
        _bs = NamedSharding(mesh, PartitionSpec("data"))
        # device arrays (HBM-cache gathers) re-place device-to-device; a
        # np.asarray round trip would pull them back through the host
        place = lambda x: jax.device_put(
            x if isinstance(x, jax.Array) else np.asarray(x), _bs)
    else:
        place = jnp.asarray

    def build_predict(name: str):
        if name == "pallas":
            engine = FusedMACEngine(cfg, emb_init, mesh=mesh)
            # kbl (GQA per-example valid-object counts) masks the read
            # attention inside the kernel, matching the XLA path
            if get_att:
                def _fused_predict(p, q, l, im, kbl=None):
                    logits, atts = engine({"params": p}, q, l, im,
                                          get_att=True, kb_lengths=kbl)
                    return jnp.argmax(logits, -1).astype(jnp.int32), atts
                return jax.jit(_fused_predict)
            return jax.jit(lambda p, q, l, im, kbl=None: (jnp.argmax(
                engine({"params": p}, q, l, im, kb_lengths=kbl),
                -1).astype(jnp.int32), {}))

        def _xla_predict(p, q, l, im, kbl=None):
            logits, atts = model.apply(
                {"params": p, **({"batch_stats": state.batch_stats}
                                 if state.batch_stats else {})},
                q, l, im, train=False, kb_lengths=kbl)
            preds = jnp.argmax(logits, -1).astype(jnp.int32)
            return preds, (atts if get_att else {})
        return jax.jit(_xla_predict)

    # K-deep dispatch depth (--requestsPerDispatch): known up front so the
    # probe can time the dispatch mode serving will ACTUALLY run
    K = max(1, int(cfg.requestsPerDispatch))
    K_eff = K if not get_att else 1

    def make_scan_predict(predict_fn):
        """One jitted lax.scan over K stacked request batches."""
        def _scan_predict(p, qk, lk, imk, kblk=None):
            def body(_, x):
                if kblk is None:
                    q, l, im = x
                    kbl = None
                else:
                    q, l, im, kbl = x
                return None, predict_fn(p, q, l, im, kbl)[0]
            xs = ((qk, lk, imk) if kblk is None else (qk, lk, imk, kblk))
            _, outs = jax.lax.scan(body, None, xs)
            return outs                              # [K, B]
        return jax.jit(_scan_predict)

    # engine selection: "auto" self-calibrates on a real TPU — a one-shot
    # micro-probe times both jitted paths at the requested batch shape and
    # dispatch depth, and the winner is cached per device kind + shape + K
    # (the v5e-measured crossover moved between TPU generations; with
    # --requestsPerDispatch the ranking flips again — BENCH_r04 b1:
    # xla_k8 0.412 vs pallas_k8 0.516 ms; resolve_engine).  With the
    # probe off (or no TPU) the measured-regime heuristic applies: fused
    # wins small HBM-bound batches where its KB-resident recurrence moves
    # 3.3x fewer bytes/question (BENCH_r03: 4.23 vs 14.06 MB/q), XLA wins
    # MXU-bound large batches at the matmul roofline (ARCHITECTURE.md).
    built = {}
    timer = None
    if (cfg.servingEngine == "auto" and not cfg.usePallas and pallas_ok
            and cfg.servingProbe and jax.default_backend() == "tpu"):
        H_, W_, C_ = cfg.imageDims
        d_q = place(np.ones((B, 8), np.int32))
        d_l = place(np.full((B,), 8, np.int32))
        d_img = place(np.zeros((B, H_, W_, C_), np.float32))
        d_kbl = (place(np.full((B,), H_ * W_, np.int32))
                 if cfg.dataset == "GQA" and cfg.gqaFeatures == "objects"
                 else None)
        if K_eff > 1:
            stackK = lambda x: (None if x is None else
                                jnp.broadcast_to(x, (K_eff,) + x.shape))
            dK_q, dK_l, dK_img, dK_kbl = (stackK(d_q), stackK(d_l),
                                          stackK(d_img), stackK(d_kbl))

        def timer(name: str) -> float:
            fn = built.setdefault(name, build_predict(name))
            if K_eff > 1:                # time the K-deep scan path
                run_fn = make_scan_predict(fn)
                args = (params, dK_q, dK_l, dK_img, dK_kbl)
                run = lambda: np.asarray(run_fn(*args))
            else:
                args = (params, d_q, d_l, d_img, d_kbl)
                run = lambda: np.asarray(fn(*args)[0])
            for _ in range(2):                       # compile + warmup
                run()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            return best

    choice = resolve_engine(
        cfg, jax.default_backend(), timer=timer,
        device_kind=jax.devices()[0].device_kind, dispatch_depth=K_eff)
    if choice == "pallas" and not pallas_ok:
        choice = "xla"
    if cfg.servingEngine == "auto" and not cfg.usePallas:
        print(f"serve: engine=auto -> {choice} at batchSize "
              f"{cfg.batchSize}"
              + ("" if timer is not None else
                 f" (static crossover {SMALL_BATCH_CROSSOVER})"),
              file=sys.stderr)
    cfg.usePallas = choice == "pallas"
    predict = built.get(choice) or build_predict(choice)

    loader = ImageLoader({"imagesFilename": cfg.imagesFile(tier),
                          **({"imageIdsFilename": cfg.imagesIdsFile(tier)}
                             if cfg.dataset in ("NLVR", "GQA") else {}),
                          **({"imagesInfoFilename": cfg.imagesInfoFile(tier)}
                             if cfg.dataset == "GQA" else {})}, cfg)
    # K-deep dispatch (the serving analogue of --stepsPerDispatch): when
    # the request queue is >= K batches deep, K batches ride ONE jitted
    # lax.scan dispatch — at B<=8 the per-call host dispatch (~0.9 ms)
    # dominates the ~0.2 ms compute, so this amortizes it K-fold.
    # Attention export stays per-batch (K*T*B maps would balloon memory).
    predict_k = None
    if K > 1 and not get_att:
        predict_k = make_scan_predict(predict)
        if mesh is not None:
            _bsk = NamedSharding(mesh, PartitionSpec(None, "data"))
            place_k = lambda x: jax.device_put(
                x if isinstance(x, jax.Array) else np.asarray(x), _bsk)
        else:
            place_k = jnp.asarray

    loader.open()
    # --hbmData: device-resident feature table — per-request-batch image
    # assembly becomes an on-device gather (same budget/auto gate as
    # training; data/loader.py HBMFeatureCache)
    from mac_network_tpu.data.loader import resolve_hbm_cache
    hbm_cache = resolve_hbm_cache({}, loader, cfg,
                                  process_count=jax.process_count(),
                                  mesh=mesh)
    try:
        t0 = time.time()
        n = len(requests)
        preds_all = []
        atts_all = []

        def make_batch(start):
            chunk = requests[start:start + B]
            id_batch = {"imageIds": [r["imageId"] for r in chunk]}
            if hbm_cache is not None:
                img = hbm_cache.gather(id_batch["imageIds"], batch_size=B)
            else:
                img = loader.load_batch(id_batch)
            n_obj = loader.objects_num(id_batch)
            q = questions[start:start + B]
            l = lengths[start:start + B]
            pad = B - len(chunk)
            if pad:
                q = np.concatenate([q, np.repeat(q[-1:], pad, 0)])
                l = np.concatenate([l, np.repeat(l[-1:], pad, 0)])
                if hbm_cache is None:
                    img = np.concatenate(
                        [img, np.repeat(img[-1:], pad, 0)])
                if n_obj is not None:
                    n_obj = np.concatenate(
                        [n_obj, np.repeat(n_obj[-1:], pad, 0)])
            return q, l, img, n_obj, len(chunk)

        starts = list(range(0, n, B))
        i = 0
        while i < len(starts):
            if predict_k is not None and i + K <= len(starts):
                batches = [make_batch(starts[i + j]) for j in range(K)]
                kblk = (None if batches[0][3] is None else
                        place_k(np.stack([b[3] for b in batches])))
                img_k = (jnp.stack([b[2] for b in batches])
                         if hbm_cache is not None
                         else np.stack([b[2] for b in batches]))
                outs = predict_k(
                    params,
                    place_k(np.stack([b[0] for b in batches])),
                    place_k(np.stack([b[1] for b in batches])),
                    place_k(img_k), kblk)
                outs = np.asarray(outs)
                for j, b in enumerate(batches):
                    preds_all.extend(outs[j][:b[4]].tolist())
                i += K
                continue
            q, l, img, n_obj, n_valid = make_batch(starts[i])
            out, atts = predict(params, place(q), place(l), place(img),
                                None if n_obj is None else place(n_obj))
            out = np.asarray(out)
            preds_all.extend(out[:n_valid].tolist())
            if get_att:
                # atts: {name: [T, B, ...]} -> per-instance nested lists,
                # the same schema as train/driver.py build_preds_list
                atts = {k: np.asarray(v) for k, v in atts.items()}
                for j in range(n_valid):
                    atts_all.append({
                        k: [a[t, j].tolist() for t in range(a.shape[0])]
                        for k, a in atts.items()})
            i += 1
        dt = time.time() - t0
    finally:
        loader.close()

    for i, (r, p) in enumerate(zip(requests, preds_all)):
        r["prediction"] = answer_dict.decodeId(int(p))
        if get_att:
            r["attentions"] = atts_all[i]
    with open(output_path, "w") as f:
        json.dump(requests, f)
    stats = {"count": n, "seconds": dt,
             "qps": n / dt if dt > 0 else float("inf"), "epoch": epoch}
    print(json.dumps(stats))
    return stats


def main(argv=None):
    from mac_network_tpu.config import build_parser, Config, \
        load_dataset_config
    parser = build_parser()
    parser.add_argument("--input", required=True,
                        help="JSON list of {question, imageId}")
    parser.add_argument("--output", required=True)
    parser.add_argument("--tier", default="val",
                        help="which tier's feature file to read images from")
    ns = parser.parse_args(argv)
    cfg = Config()
    tier = ns.tier
    inp, outp = ns.input, ns.output
    for k, v in vars(ns).items():
        if k in ("input", "output", "tier"):
            continue
        setattr(cfg, k, v)
    load_dataset_config(cfg)
    from mac_network_tpu.config import apply_prng_impl
    apply_prng_impl(cfg)
    serve(cfg, inp, outp, tier=tier, get_att=cfg.getAtt)


if __name__ == "__main__":
    main()
