"""Training / evaluation orchestration (reference: main.py:546-797).

Per epoch: bucketed shuffled batches -> prefetching loader -> jitted train
step -> stats/console -> periodic mid-epoch checkpoint.  After each training
epoch: checkpoint, evaluate with EMA params (the reference swaps EMA
checkpoints on disk, main.py:716-729; here EMA is part of the TrainState),
CSV record, LR-plateau decay, early stopping.  finalTest evaluates all
tiers with EMA (or raw) weights.
"""

from __future__ import annotations

import math
import random
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from mac_network_tpu.config import Config
from mac_network_tpu.data.loader import (
    ImageLoader, PrefetchIterator, get_batches, get_length, pad_batch,
    trim_batch)
from mac_network_tpu.train import logging as maclog
from mac_network_tpu.train.checkpoint import save_checkpoint


def build_preds_list(answer_dict, batch: Dict, predictions,
                     attentions=None) -> List[Dict]:
    """Decode predictions back into instance dicts, optionally nesting
    per-step attention maps (reference: model.py:693-710)."""
    preds = []
    n_valid = int(batch.get("mask", np.ones(len(batch["answers"]))).sum())
    for i, instance in enumerate(batch["instances"][:n_valid]):
        inst = dict(instance)
        if predictions is not None:
            inst["prediction"] = answer_dict.decodeId(int(predictions[i]))
        if attentions is not None:
            inst["attentions"] = {
                k: [np.asarray(step[i]).tolist() for step in att]
                for k, att in attentions.items()}
        preds.append(inst)
    return preds


def improve_enough(curr: Dict, prior: Dict, lr: float) -> bool:
    """LR-plateau heuristic: thresholds on the train-loss improvement at
    successively lower loss/lr regimes (reference: main.py:239-255)."""
    prev_res = prior["prev"]["res"]
    if prev_res is None:
        return True
    prev_loss = prev_res["train"]["loss"]
    curr_loss = curr["res"]["train"]["loss"]
    diff = prev_loss - curr_loss
    plateaued = ((diff < 0.015 and prev_loss < 0.5 and lr > 0.00002) or
                 (diff < 0.008 and prev_loss < 0.15 and lr > 0.00001) or
                 (diff < 0.003 and prev_loss < 0.10 and lr > 0.000005))
    return not plateaued


def better(curr_res: Dict, best_res: Dict) -> bool:
    return curr_res["val"]["acc"] > best_res["val"]["acc"]


def choose_training_data(cfg: Config, data: Dict):
    """Main vs extra dataset selection (reference: main.py:205-218)."""
    training = data["main"]["train"]
    alter = None
    if cfg.extra:
        if cfg.trainExtra:
            training = (data["extra"]["val"] if cfg.extraVal
                        else data["extra"]["train"])
        if cfg.alterExtra:
            alter = data["extra"]["train"]
    return training, alter


def alternate_data(cfg: Config, batches: List, alter_data: Dict,
                   data_len: int, py_rng=random, np_rng=None):
    """Insert extra-dataset batches every alterNum main batches
    (reference: main.py:343-372)."""
    alter = alter_data["data"][0]          # extra data is not bucketed
    needed = math.ceil(len(batches) / cfg.alterNum)
    per_data = max(1, math.ceil(get_length(alter) / cfg.batchSize))
    repetitions = math.ceil(needed / per_data)
    alter_batches = []
    for _ in range(repetitions):
        rep = get_batches(alter, cfg.batchSize, rng=np_rng)
        py_rng.shuffle(rep)
        alter_batches += rep
    curr = len(batches) - 1
    for ab in alter_batches:
        if curr < 0:
            break
        batches.insert(curr, ab)
        data_len += get_length(ab)
        curr -= cfg.alterNum
    return batches, data_len


class Runner:
    """Owns the jitted steps and device placement for the epoch loop."""

    def __init__(self, cfg: Config, model, train_step, eval_step,
                 eval_step_att, answer_dict, device_put=None,
                 train_multistep=None, device_put_stacked=None,
                 image_put=None, image_put_stacked=None, mesh=None):
        self.cfg = cfg
        self.model = model
        self.train_step = train_step
        self.eval_step = eval_step
        self.eval_step_att = eval_step_att
        self.answer_dict = answer_dict
        self.device_put = device_put or (lambda b: b)
        # --stepsPerDispatch K: one lax.scan dispatch per K same-shape
        # batches (steps.py make_train_multistep)
        self.train_multistep = train_multistep
        self.device_put_stacked = device_put_stacked or (lambda b: b)
        # --hbmData: per-tier device-resident feature tables, persisted
        # across epochs (filename -> HBMFeatureCache); image_put re-places
        # gathered features onto the mesh's data axis
        self.image_put = image_put
        self.image_put_stacked = image_put_stacked
        self.mesh = mesh               # sharded HBM cache + batch placement
        self._hbm_caches: Dict = {}

    # --------------------------------------------------------------- epoch
    def run_epoch(self, state, tier_data: Dict, train: bool, epoch: int,
                  rng=None, saver_hook=None, alter_data=None,
                  get_att: bool = False, get_preds: bool = True,
                  calle=None, stop_flag=None, start_batch: int = 0):
        """(reference: runEpoch, main.py:546-633)

        ``start_batch``: resume the epoch at this batch index — the batch
        order is deterministic per (seed, epoch), so a preemption
        checkpoint's batch cursor reconstructs exactly the remaining
        batches.  The returned res carries ``batchCursor``: the number of
        batches consumed when a stop_flag interrupted the epoch (0 = ran
        to completion)."""
        cfg = self.cfg
        start_time0 = time.time()
        stats = maclog.init_stats()
        preds: List[Dict] = []

        # optional device trace of the first training epoch
        # (reference has wall-clock timing only — SURVEY.md §5 tracing gap)
        profiling = cfg.profile and train and epoch == 1
        if profiling:
            import os
            jax.profiler.start_trace(os.path.join(cfg.logDir(), "profile"))

        loader = ImageLoader(tier_data["images"], cfg)
        loader.open()
        try:
            buckets = tier_data["data"]
            data_len = sum(get_length(b) for b in buckets)
            # deterministic per-(seed, epoch) instance AND batch order: a
            # preemption checkpoint's batch cursor then identifies exactly
            # the remaining batches on resume.  String seeding hashes the
            # tuple (sha512 in CPython's Random; MT init_by_array for
            # numpy), so nearby epochs get fully decorrelated streams.
            order_key = f"{cfg.seed}/{epoch}/{int(train)}"
            np_rng = np.random.RandomState(
                np.frombuffer(order_key.encode(), dtype=np.uint8).astype(
                    np.uint32))
            py_rng = random.Random(order_key)
            batches: List[Dict] = []
            for bucket in buckets:
                batches += get_batches(bucket, cfg.batchSize, rng=np_rng)
            py_rng.shuffle(batches)
            if train and alter_data is not None:
                batches, data_len = alternate_data(
                    cfg, batches, alter_data, data_len, py_rng, np_rng)
            if start_batch:
                batches = batches[start_batch:]

            from mac_network_tpu.parallel.multihost import process_info
            pi, pc = process_info()
            # --hbmData: device-resident feature table (one upload per run,
            # per-batch on-device gather; loader.py HBMFeatureCache)
            from mac_network_tpu.data.loader import resolve_hbm_cache
            hbm_cache = resolve_hbm_cache(self._hbm_caches, loader, cfg,
                                          process_count=pc, mesh=self.mesh)
            prefetch = PrefetchIterator(batches, loader, cfg, train,
                                        depth=cfg.prefetchDepth,
                                        process_index=pi, process_count=pc,
                                        hbm_cache=hbm_cache)

            # One-batch-deep software pipeline: the device executes batch N
            # while the host converts batch N-1's metrics — the D2H fetch of
            # the previous result overlaps the current step (the reference
            # blocks in sess.run every batch, model.py:746).
            pending = None      # (batch_num, batch, device_out, atts, times)

            def drain(pending):
                nonlocal stats, preds
                batch_num, batch, out, d_atts, (t0, t1, t2) = pending
                # loss/correct are global (psum over the data axis); under
                # multi-host the local mask covers only this process's rows,
                # so the global valid count rides on the batch
                n_valid = int(batch.get("nValidGlobal", batch["mask"].sum()))
                # The jitted call returns as soon as the step is *dispatched*
                # (async dispatch); fetching the metrics to host is what
                # blocks until the device finishes.  The honest device-time
                # proxy is dispatch + that blocking fetch — t2-t1 alone
                # measures only dispatch and is fiction on TPU.
                t3 = time.time()
                res = {
                    "loss": float(out["loss"]),
                    "correctNum": float(out["correct"]),
                    "gradNorm": float(out["gradNorm"]) if "gradNorm" in out
                    else -1.0,
                    "preds": np.asarray(out["preds"]),
                }
                t4 = time.time()
                atts = ({k: np.asarray(v) for k, v in d_atts.items()}
                        if d_atts is not None else None)
                res["acc"] = res["correctNum"] / max(n_valid, 1)
                res["readTime"] = t1 - t0
                res["trainTime"] = (t2 - t1) + (t4 - t3)
                stats = maclog.update_stats(stats, res, n_valid)
                if get_preds:
                    preds += build_preds_list(self.answer_dict, batch,
                                              res["preds"], atts)
                print(maclog.stats_line(cfg, stats, res, epoch, batch_num,
                                        data_len, t0), end="", flush=True)

            cursor = 0          # batches consumed when interrupted
            use_chunks = (train
                          and int(getattr(cfg, "stepsPerDispatch", 1)) > 1
                          and self.train_multistep is not None)
            if use_chunks:
                state, cursor = self._run_chunked(
                    state, prefetch, rng, drain, saver_hook, calle,
                    stop_flag, epoch, start_batch, hbm_cache=hbm_cache)
                print("")
                return state, {"loss": stats["loss"], "acc": stats["acc"],
                               "preds": preds, "batchCursor": cursor}

            for batch_num, batch in enumerate(prefetch, start=start_batch):
                t0 = time.time()
                arr_keys = (("questions", "questionLengths", "answers",
                             "mask")
                            + (() if hbm_cache else ("images",))
                            + (("imageObjectsNum",)
                               if "imageObjectsNum" in batch else ()))
                device_batch = self.device_put(
                    {k: batch[k] for k in arr_keys})
                if hbm_cache is not None:
                    device_batch["images"] = hbm_cache.gather(
                        batch["imageIds"], cfg.batchSize, put=self.image_put)
                t1 = time.time()
                if train:
                    state, out = self.train_step(
                        state, device_batch, float(cfg.lr), rng)
                    d_atts = None
                else:
                    params = state.eval_params(cfg.useEMA)
                    step_fn = self.eval_step_att if get_att else self.eval_step
                    out = step_fn(params, state.batch_stats, device_batch)
                    d_atts = out.pop("attentions", None) if get_att else None
                t2 = time.time()

                if pending is not None:
                    drain(pending)
                pending = (batch_num, batch, out, d_atts, (t0, t1, t2))

                if train and saver_hook is not None and batch_num > 0 \
                        and batch_num % cfg.saveEvery == 0:
                    print("\nsaving weights (mid-epoch)")
                    saver_hook(state, epoch, batch_num + 1)

                # custom periodic hook (reference: calleEvery, main.py:616-618)
                if calle is not None and batch_num > 0 \
                        and batch_num % cfg.calleEvery == 0:
                    calle()

                # preemption: stop at a batch boundary with current state
                if stop_flag is not None and stop_flag.get("flag"):
                    cursor = batch_num + 1
                    break
            if pending is not None:
                drain(pending)
            print("")
        finally:
            loader.close()
            if profiling:
                jax.profiler.stop_trace()

        return state, {"loss": stats["loss"], "acc": stats["acc"],
                       "preds": preds, "batchCursor": cursor}

    # --------------------------------------------- chunked dispatch (train)
    def _run_chunked(self, state, prefetch, rng, drain, saver_hook, calle,
                     stop_flag, epoch, start_batch: int = 0,
                     hbm_cache=None):
        """--stepsPerDispatch K training loop: accumulate K consecutive
        same-shape batches and run them through ONE lax.scan device
        dispatch (steps.py make_train_multistep) — numerically identical
        to K single steps, at 1/K the host-dispatch latency.  A bucket
        shape change, a saveEvery/calleEvery boundary, a preemption flag
        or the epoch tail flushes a partial chunk through the per-batch
        step.  One chunk of results stays pending while the next chunk
        computes (same software pipeline as the per-batch loop)."""
        cfg = self.cfg
        K = int(cfg.stepsPerDispatch)
        keys = (("questions", "questionLengths", "answers", "mask")
                + (() if hbm_cache else ("images",)))

        def batch_keys(b):
            return keys + (("imageObjectsNum",)
                           if "imageObjectsNum" in b else ())

        def gathered(b, put):
            return hbm_cache.gather(b["imageIds"], cfg.batchSize, put=put)

        def dispatch(state, chunk):
            t0 = time.time()
            if len(chunk) == K:
                stacked = {k: np.stack([np.asarray(b[k]) for _, b in chunk])
                           for k in batch_keys(chunk[0][1])}
                dev = self.device_put_stacked(stacked)
                if hbm_cache is not None:
                    # [K, B, ...] on-device stack of per-batch gathers,
                    # placed on the stacked (scan-axis-second) sharding
                    import jax.numpy as jnp
                    imgs = jnp.stack(
                        [gathered(b, put=None) for _, b in chunk])
                    dev["images"] = (self.image_put_stacked(imgs)
                                     if self.image_put_stacked else imgs)
                t1 = time.time()
                state, outs = self.train_multistep(state, dev,
                                                   float(cfg.lr), rng)
                t2 = time.time()
                return state, (chunk, outs, (t0, t1, t2))
            # ragged tail or shape break: per-batch steps
            outs_l = []
            t1 = time.time()
            for _, b in chunk:
                dev = self.device_put({k: b[k] for k in batch_keys(b)})
                if hbm_cache is not None:
                    dev["images"] = gathered(b, put=self.image_put)
                state, out = self.train_step(state, dev, float(cfg.lr), rng)
                outs_l.append(out)
            t2 = time.time()
            outs = {k: [o[k] for o in outs_l] for k in outs_l[0]}
            return state, (chunk, outs, (t0, t1, t2))

        def drain_chunk(pending):
            entries, outs, (t0, t1, t2) = pending
            # the chunk's wall time covers ALL its batches: apportion it
            # so per-batch readTime/trainTime and the epoch stats stay
            # honest (drain computes t1-t0 and t2-t1 per entry)
            n = max(1, len(entries))
            read_dt, run_dt = (t1 - t0) / n, (t2 - t1) / n
            for i, (bn, b) in enumerate(entries):
                out_i = {k: v[i] for k, v in outs.items()}
                drain((bn, b, out_i, None,
                       (t0, t0 + read_dt, t0 + read_dt + run_dt)))

        chunk, chunk_sig, pending = [], None, None
        cursor = 0
        for batch_num, batch in enumerate(prefetch, start=start_batch):
            sig = tuple(np.asarray(batch[k]).shape
                        for k in batch_keys(batch))
            if chunk and sig != chunk_sig:          # bucket shape change
                state, new_pending = dispatch(state, chunk)
                if pending is not None:
                    drain_chunk(pending)
                pending, chunk = new_pending, []
            chunk_sig = sig
            chunk.append((batch_num, batch))
            save_now = (saver_hook is not None and batch_num > 0
                        and batch_num % cfg.saveEvery == 0)
            calle_now = (calle is not None and batch_num > 0
                         and batch_num % cfg.calleEvery == 0)
            stop_now = stop_flag is not None and stop_flag.get("flag")
            if len(chunk) == K or save_now or calle_now or stop_now:
                state, new_pending = dispatch(state, chunk)
                if pending is not None:
                    drain_chunk(pending)
                pending, chunk = new_pending, []
            if save_now:
                print("\nsaving weights (mid-epoch)")
                saver_hook(state, epoch, batch_num + 1)
            if calle_now:
                calle()
            if stop_now:
                cursor = batch_num + 1
                break
        if chunk:
            state, new_pending = dispatch(state, chunk)
            if pending is not None:
                drain_chunk(pending)
            pending = new_pending
        if pending is not None:
            drain_chunk(pending)
        return state, cursor

    # ---------------------------------------------------------- evaluation
    def run_evaluation(self, state, data: Optional[Dict], epoch: int,
                       eval_train: bool = True, eval_test: bool = False,
                       get_att: Optional[bool] = None):
        """(reference: runEvaluation, main.py:222-236)"""
        cfg = self.cfg
        if get_att is None:
            get_att = cfg.getAtt
        res = {"evalTrain": None, "val": None, "test": None}
        if data is None:
            return res
        if eval_train and cfg.evalTrain and data.get("evalTrain"):
            _, res["evalTrain"] = self.run_epoch(
                state, data["evalTrain"], train=False, epoch=epoch,
                get_att=get_att)
        _, res["val"] = self.run_epoch(state, data["val"], train=False,
                                       epoch=epoch, get_att=get_att)
        if (eval_test or cfg.test) and data.get("test"):
            _, res["test"] = self.run_epoch(state, data["test"], train=False,
                                            epoch=epoch, get_att=get_att)
        return res

    # ------------------------------------------------------------ training
    def train(self, state, data: Dict, preprocessor, rng,
              restore_epoch: int = 0, start_batch: int = 0):
        """Full training orchestration (reference: main.py:693-775).

        Preemption safety (a reference gap — SURVEY.md §5 "failure
        detection: none"): SIGTERM/SIGINT request a checkpoint at the next
        batch boundary before exiting; the checkpoint carries the epoch's
        batch cursor (checkpoint.py cursor sidecar), and ``--restore``
        resumes the interrupted epoch at exactly the next batch — the
        batch order is deterministic per (seed, epoch), so data coverage
        is batch-granular, not epoch-granular.  ``start_batch``: resume
        epoch ``restore_epoch`` itself at this batch index (0 = it
        completed; start at restore_epoch + 1).
        """
        cfg = self.cfg
        start0 = time.time()
        best_epoch = restore_epoch
        best_res = None
        prev_res = None
        epoch = restore_epoch

        def saver_hook(st, ep, cursor: int = 0):
            save_checkpoint(cfg, st, ep,
                            extra={"lr": cfg.lr, "epoch": ep,
                                   "batchCursor": cursor})

        import signal
        preempted = {"flag": False}

        def _on_term(signum, frame):
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except (ValueError, OSError):
                pass



        first_epoch = restore_epoch + (0 if start_batch else 1)
        for epoch in range(first_epoch, cfg.epochs + 1):
            resuming = epoch == first_epoch and start_batch > 0
            print(maclog.bcolored(
                f"Training epoch {epoch}..."
                + (f" (resuming at batch {start_batch})" if resuming
                   else ""), "green"))
            start = time.time()

            training_data, alter_data = choose_training_data(cfg, data)
            epoch_rng = jax.random.fold_in(rng, epoch)
            state, train_res = self.run_epoch(
                state, training_data, train=True, epoch=epoch, rng=epoch_rng,
                saver_hook=saver_hook, alter_data=alter_data,
                get_preds=bool(cfg.analysisType), stop_flag=preempted,
                start_batch=start_batch if resuming else 0)

            if preempted["flag"]:
                print(maclog.bcolored(
                    "preemption requested: checkpointing and stopping",
                    "red"))
                saver_hook(state, epoch, train_res.get("batchCursor", 0))
                break

            saver_hook(state, epoch)

            # evaluation reads EMA params directly (reference restores the
            # EMA checkpoint then swaps back, main.py:716-729)
            eval_res = self.run_evaluation(state, data["main"], epoch)
            extra_eval_res = self.run_evaluation(
                state, data.get("extra"), epoch,
                eval_train=not cfg.extraVal)

            epoch_time = time.time() - start
            print("took {:.2f} seconds".format(epoch_time))
            maclog.print_dataset_results(cfg, train_res, eval_res,
                                         extra_eval_res)

            if cfg.getPreds:
                write_preds(preprocessor, eval_res, extra_eval_res)

            maclog.log_record(cfg, epoch, epoch_time, cfg.lr, train_res,
                              eval_res, extra_eval_res)

            curr_res = {"train": train_res, "val": eval_res["val"]}
            curr = {"res": curr_res, "epoch": epoch}
            if best_res is None or better(curr_res, best_res):
                best_res = curr_res
                best_epoch = epoch
            prior = {"best": {"res": best_res, "epoch": best_epoch},
                     "prev": {"res": prev_res, "epoch": epoch - 1}}

            if cfg.lrReduce and not improve_enough(curr, prior, cfg.lr):
                cfg.lr *= cfg.lrDecayRate
                print(maclog.bcolored(f"Reducing LR to {cfg.lr}", "red"))

            if cfg.earlyStopping > 0 and epoch - best_epoch > cfg.earlyStopping:
                break
            prev_res = curr_res

        for sig, handler in old_handlers.items():
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass
        print("Training took {:.2f} seconds ({} epochs)".format(
            time.time() - start0, epoch - restore_epoch))
        return state, epoch


def write_preds(preprocessor, eval_res, extra_eval_res) -> None:
    """(reference: main.py:143-149)"""
    preprocessor.writePreds(eval_res.get("evalTrain"), "evalTrain")
    preprocessor.writePreds(eval_res.get("val"), "val")
    preprocessor.writePreds(eval_res.get("test"), "test")
    if extra_eval_res:
        preprocessor.writePreds(extra_eval_res.get("evalTrain"),
                                "evalTrain", "H")
        preprocessor.writePreds(extra_eval_res.get("val"), "val", "H")
        preprocessor.writePreds(extra_eval_res.get("test"), "test", "H")
