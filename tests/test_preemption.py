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
    cfg = make_cfg(tmp_path, expName="preempt", epochs=50, getPreds=False,
                   evalTrain=False)

    # fire SIGTERM shortly after training starts
    def fire():
        time.sleep(20)
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=fire, daemon=True)
    t.start()
    start = time.time()
    main(cfg)                       # returns instead of running 50 epochs
    elapsed = time.time() - start
    assert elapsed < 300, "did not stop on SIGTERM"

    # a checkpoint exists and is restorable
    epochs = [d for d in os.listdir(cfg.weightsDir())
              if d.startswith("weights")]
    assert epochs, "no checkpoint written on preemption"

    cfg2 = make_cfg(tmp_path, expName="preempt", epochs=1, train=False,
                    finalTest=True, restore=True, getPreds=False,
                    evalTrain=False)
    main(cfg2)                      # restore + eval completes
