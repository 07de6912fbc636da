"""Training / evaluation CLI (reference: main.py:651-802).

Usage mirrors the reference:
    python main.py --train --expName exp @configs/args.txt
    python main.py --finalTest --restore --expName exp @configs/args.txt

Pipeline: parse flags -> dataset config -> preprocess -> build model + state
-> (restore) -> train epochs with EMA evaluation, CSV logging, LR-plateau
decay, early stopping -> final test -> predictions/attention export.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mac_network_tpu.config import Config, load_dataset_config, parse_args
from mac_network_tpu.data import Preprocesser
from mac_network_tpu.models import MACNetwork
from mac_network_tpu.parallel import (
    assemble_global, make_mesh, maybe_initialize, process_info, shard_batch,
    shard_params)
from mac_network_tpu.train import (
    create_train_state, make_eval_step, make_optimizer, make_train_step)
from mac_network_tpu.train import logging as maclog
from mac_network_tpu.train.checkpoint import restore_checkpoint
from mac_network_tpu.train.driver import Runner, write_preds


def build_state_and_runner(cfg: Config, embeddings, answer_dict):
    """Construct model, jitted steps, device mesh and initial TrainState."""
    # --gpusNum N maps onto the data-parallel mesh axis (the reference's
    # multi-GPU towers, model.py:776-824, with working gradient reduction)
    if cfg.gpusNum > 1 and cfg.meshData == 0:
        cfg.meshData = min(cfg.gpusNum, len(jax.devices()))
    n_data = cfg.meshData if cfg.meshData > 0 else (
        len(jax.devices()) // max(1, cfg.meshModel))
    if cfg.batchSize % max(1, n_data) != 0:
        raise SystemExit(
            f"--batchSize {cfg.batchSize} must be divisible by the "
            f"data-parallel mesh axis ({n_data} devices)")

    model = MACNetwork(cfg, embeddings)
    tx = make_optimizer(cfg)

    H, W, C = cfg.imageDims
    B = cfg.batchSize
    dummy_q = jnp.zeros((B, 8), jnp.int32)
    dummy_len = jnp.ones((B,), jnp.int32)
    dummy_img = jnp.zeros((B, H, W, C), jnp.float32)
    rngs = {"params": jax.random.key(cfg.seed),
            "dropout": jax.random.key(cfg.seed + 1)}
    variables = model.init(rngs, dummy_q, dummy_len, dummy_img, train=False)

    mesh = make_mesh(cfg)
    variables = {"params": shard_params(variables["params"], mesh),
                 **{k: v for k, v in variables.items() if k != "params"}}
    state = create_train_state(cfg, variables, tx)

    # multi-host: each process feeds its local rows; globals are assembled
    # via make_array_from_process_local_data (parallel/multihost.py)
    _, pc = process_info()
    if pc > 1:
        device_put = lambda b: assemble_global(b, mesh, cfg.batchSize)
    else:
        device_put = lambda b: shard_batch(b, mesh)

    step_model = model
    if cfg.fusedTrain:
        from mac_network_tpu.ops.pallas import (
            FusedTrainEngine, supports_fused_train)
        if supports_fused_train(cfg):
            # the engine exposes the same .apply contract as the model, so
            # the loss/optimizer plumbing in steps.py is reused verbatim;
            # under a multi-device mesh the fwd/bwd kernels shard_map over
            # the data axis (each device runs its batch shard).  On a real
            # single-host TPU the one-shot probe picks whichever engine is
            # faster at this batch shape (train/engine_probe.py — at some
            # operating points, e.g. GQA 100x2048, XLA wins)
            from mac_network_tpu.train.engine_probe import (
                make_step_timer, resolve_train_engine)
            fused_factory = lambda: FusedTrainEngine(cfg, embeddings,
                                                     mesh=mesh)
            timer = None
            if (jax.default_backend() == "tpu" and pc == 1
                    and cfg.fusedTrainProbe):
                timer = make_step_timer(
                    cfg, tx, variables, device_put,
                    jax.random.key(cfg.seed + 2))
            step_model = resolve_train_engine(
                cfg, model, fused_factory, timer=timer,
                device_kind=jax.devices()[0].device_kind)
        else:
            print("main: config outside the fused-train envelope "
                  "(see ops/pallas/mac_train.py); using the XLA train step")
    train_step = make_train_step(step_model, cfg, tx)
    if cfg.usePallas:
        from mac_network_tpu.ops.pallas import (
            FusedMACEngine, supports_fused_config)
        from mac_network_tpu.train.steps import make_fused_eval_step
        if supports_fused_config(cfg):
            engine = FusedMACEngine(cfg, embeddings, mesh=mesh)
            eval_step = make_fused_eval_step(engine, cfg)
        else:
            print(maclog.bcolored(
                "--usePallas: config outside the fused-kernel envelope; "
                "using the XLA path", "yellow"))
            eval_step = make_eval_step(model, cfg, with_attention=False)
    else:
        eval_step = make_eval_step(model, cfg, with_attention=False)
    eval_step_att = make_eval_step(model, cfg, with_attention=True)

    # --stepsPerDispatch K: K optimizer steps per device dispatch via
    # lax.scan (steps.py make_train_multistep); single-host only — the
    # per-process batch assembly feeds one batch at a time
    train_multistep = device_put_stacked = None
    if cfg.stepsPerDispatch > 1:
        if pc > 1:
            print(maclog.bcolored(
                "--stepsPerDispatch: multi-host run; falling back to "
                "per-batch dispatch", "yellow"))
        else:
            from mac_network_tpu.train.steps import make_train_multistep
            from mac_network_tpu.parallel import shard_batch_stacked
            # step_model already reflects the fused-vs-XLA probe decision
            train_multistep = make_train_multistep(step_model, cfg, tx)
            device_put_stacked = lambda b: shard_batch_stacked(b, mesh)

    # --hbmData: gathered image features come off the device-resident
    # table on the default device; re-place them onto the mesh's data axis
    # (device-to-device, no host round trip)
    from mac_network_tpu.parallel.mesh import (batch_sharding,
                                               stacked_batch_sharding)
    image_put = lambda x: jax.device_put(x, batch_sharding(mesh))
    image_put_stacked = lambda x: jax.device_put(
        x, stacked_batch_sharding(mesh))

    runner = Runner(cfg, model, train_step, eval_step, eval_step_att,
                    answer_dict, device_put=device_put,
                    train_multistep=train_multistep,
                    device_put_stacked=device_put_stacked,
                    image_put=image_put,
                    image_put_stacked=image_put_stacked, mesh=mesh)
    return model, state, runner, mesh


def main(cfg: Config) -> None:
    # multi-host: jax.distributed.initialize BEFORE first backend use
    # (no-op unless --coordinatorAddress/--processCount or JAX_* env set)
    if maybe_initialize(cfg):
        print(maclog.bcolored(
            "distributed: process {}/{}".format(*process_info()), "cyan"))

    # one seed governs data shuffling, param init and dropout streams —
    # resume-deterministic (the reference leaves data-order RNG unseeded;
    # SURVEY.md §5 checkpoint/resume gap) — and, multi-host, makes every
    # process draw the same batch composition without coordination
    import random as _random
    _random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    # persistent XLA compilation cache: repeated runs skip the 1-2 minute
    # train-step compiles
    import os
    cache_dir = os.environ.get("MAC_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/mac_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    cfg.dumpJson()

    print(maclog.bold("Preprocessing data..."))
    start = time.time()
    preprocessor = Preprocesser(cfg)
    data, embeddings, answer_dict = preprocessor.preprocessData()
    print("took {:.2f} seconds".format(time.time() - start))

    print(maclog.bold("Building model..."))
    start = time.time()
    model, state, runner, mesh = build_state_and_runner(cfg, embeddings,
                                                        answer_dict)
    print("took {:.2f} seconds".format(time.time() - start))

    # restore / initialize (reference: main.py:185-201)
    epoch = 0
    start_batch = 0
    if cfg.restoreEpoch > 0 or cfg.restore:
        from mac_network_tpu.train.checkpoint import read_cursor
        if cfg.restoreEpoch == 0:
            try:
                cfg.restoreEpoch, cfg.lr = maclog.last_logged_epoch(cfg)
            except (ValueError, IndexError, FileNotFoundError):
                # preempted before the first epoch record: fall back to the
                # newest checkpoint directory
                from mac_network_tpu.train.checkpoint import latest_epoch
                cfg.restoreEpoch = latest_epoch(cfg)
            # a mid-epoch preemption checkpoint sits one past the CSV tail
            # with a batch-cursor sidecar: resume THAT epoch at its cursor
            # (batch-granular data coverage; driver.py run_epoch)
            if read_cursor(cfg, cfg.restoreEpoch + 1):
                cfg.restoreEpoch += 1
        start_batch = read_cursor(cfg, cfg.restoreEpoch)
        print(maclog.bcolored(
            "Restoring epoch {} and lr {}".format(cfg.restoreEpoch, cfg.lr)
            + (f" (mid-epoch batch cursor {start_batch})" if start_batch
               else ""), "cyan"))
        state = restore_checkpoint(cfg, state, cfg.restoreEpoch, mesh=mesh)
        epoch = cfg.restoreEpoch
    else:
        maclog.log_init(cfg)

    rng = jax.random.key(cfg.seed + 2)

    if cfg.train:
        state, epoch = runner.train(state, data, preprocessor, rng,
                                    restore_epoch=epoch,
                                    start_batch=start_batch)

    if cfg.finalTest:
        print("Testing on epoch {}...".format(epoch))
        start = time.time()
        eval_res = runner.run_evaluation(state, data["main"], epoch,
                                         eval_test=True)
        extra_eval_res = runner.run_evaluation(
            state, data.get("extra"), epoch,
            eval_train=not cfg.extraVal, eval_test=True)
        print("took {:.2f} seconds".format(time.time() - start))
        maclog.print_dataset_results(cfg, None, eval_res, extra_eval_res)
        print("Writing predictions...")
        write_preds(preprocessor, eval_res, extra_eval_res)

    print(maclog.bcolored("Done!", "white"))


if __name__ == "__main__":
    cfg = parse_args()
    load_dataset_config(cfg)
    from mac_network_tpu.config import apply_prng_impl
    apply_prng_impl(cfg)
    main(cfg)
