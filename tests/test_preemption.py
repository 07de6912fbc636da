"""Preemption safety: SIGTERM during training checkpoints at a batch
boundary and exits; --restore resumes from it."""

import os
import signal
import threading
import time

import pytest


def test_sigterm_checkpoints_and_stops(tmp_path):
    from main import main
    from mac_network_tpu.data.synthetic import write_synthetic_dataset
    from tests.test_train_e2e import make_cfg, H, W, C

    write_synthetic_dataset(str(tmp_path), n_train=48, n_val=8, n_test=8,
                            dims=(C, H, W))
    cfg = make_cfg(tmp_path, expName="preempt", epochs=100000,
                   getPreds=False, evalTrain=False)

    # fire SIGTERM once training has demonstrably started (first epoch's
    # checkpoint exists), and never after main() returned — a stray signal
    # would kill the test process itself
    done = threading.Event()

    def fire():
        deadline = time.time() + 240
        while time.time() < deadline and not done.is_set():
            if os.path.isdir(cfg.weightsFile(1)):
                break
            time.sleep(0.5)
        if not done.is_set():
            os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=fire, daemon=True)
    t.start()
    start = time.time()
    main(cfg)                       # returns instead of running 100k epochs
    done.set()
    elapsed = time.time() - start
    t.join(timeout=5)
    assert elapsed < 400, "did not stop on SIGTERM"

    # a checkpoint exists and is restorable
    epochs = [d for d in os.listdir(cfg.weightsDir())
              if d.startswith("weights")]
    assert epochs, "no checkpoint written on preemption"

    cfg2 = make_cfg(tmp_path, expName="preempt", epochs=1, train=False,
                    finalTest=True, restore=True, getPreds=False,
                    evalTrain=False)
    main(cfg2)                      # restore + eval completes
