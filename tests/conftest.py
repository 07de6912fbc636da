"""Test configuration: run all tests on a simulated 8-device CPU platform
so DP/pjit sharding is exercised without a TPU pod (the JAX-native analogue
of a fake backend — SURVEY.md §4).

Note: the hosted TPU platform plugin ignores the JAX_PLATFORMS env var, so
we force CPU through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------------
# quick/slow split: the full suite takes ~30 min on a 1-CPU host (411 tests,
# round-4 measurement), dominated by the ~50 tests below (>= ~17 s each —
# interpret-mode Pallas parity, convergence bars, subprocess CLIs).  They
# are auto-marked `slow` so `pytest -m "not slow"` is a minutes-scale gate
# for inner-loop development; CI / the round gate still runs everything.
# Matched by "<file>.py::<test-name>" so the list survives invocation-dir
# changes; a renamed test silently drops out of the list (it just runs in
# the quick gate again until re-measured — fail-open by design).

SLOW_TESTS = frozenset({
    "test_autoenc.py::test_autoenc_contributes_to_training_loss_and_grads",
    "test_convergence.py::test_tied_read_dropout_converges",
    "test_convergence.py::test_variant_converges[args]",
    "test_convergence.py::test_variant_converges[args1]",
    "test_convergence.py::test_variant_converges[args2]",
    "test_convergence.py::test_variant_converges[args3]",
    "test_convergence.py::test_variant_converges[args4]",
    "test_flag_sweep.py::test_flag_path[stemGridRnn]",
    "test_flag_sweep.py::test_flag_path[writeSelfAtt_plain]",
    "test_fused_train.py::test_fused_train_dropout_semantics",
    "test_fused_train.py::test_fused_train_fresh_kb_dropout_semantics",
    "test_fused_train.py::test_fused_train_fresh_kb_grads_match_xla[False]",
    "test_fused_train.py::test_fused_train_fresh_kb_grads_match_xla[True]",
    "test_fused_train.py::test_fused_train_fresh_kb_multi_tile_accumulation",
    "test_fused_train.py::test_fused_train_gqa_grads_match_xla[False]",
    "test_fused_train.py::test_fused_train_gqa_grads_match_xla[True]",
    "test_fused_train.py::test_fused_train_gqa_multi_tile",
    "test_fused_train.py::test_fused_train_gqa_padded_slot_grad_invariance",
    "test_fused_train.py::test_fused_train_grads_match_xla[False]",
    "test_fused_train.py::test_fused_train_grads_match_xla[True]",
    "test_fused_train.py::test_fused_train_masks_tile_invariant",
    "test_fused_train.py::"
    "test_fused_train_mesh_dropout_stochastic_and_deterministic",
    "test_fused_train.py::test_fused_train_mesh_grads_match_single_device",
    "test_fused_train.py::test_fused_train_multi_tile_accumulation",
    "test_fused_train.py::test_fused_train_steps_reduce_loss",
    "test_fused_train.py::test_fused_train_under_dp_mesh",
    "test_gqa.py::test_gqa_cli_end_to_end",
    "test_gqa.py::test_gqa_convergence_bar",
    "test_gqa.py::test_gqa_serve_roundtrip",
    "test_multihost.py::test_two_process_distributed_matches_single",
    "test_multihost.py::test_two_process_sharded_hbm_gather_parity",
    "test_multistep.py::test_cli_with_steps_per_dispatch",
    "test_multistep.py::test_multistep_composes_with_fused_train",
    "test_multistep.py::test_multistep_matches_sequential",
    "test_multistep.py::test_multistep_sharded",
    "test_nlvr.py::test_nlvr_convergence_bar",
    "test_nlvr.py::test_nlvr_text_only_baseline_capped",
    "test_nlvr.py::test_nlvr_train_e2e",
    "test_pallas.py::test_fused_chunked_and_ragged_batch",
    "test_pallas.py::test_gqa_hundred_object_envelope",
    "test_parallel.py::test_2d_mesh_with_model_axis",
    "test_parallel.py::test_dp_matches_single_device_with_dropout",
    "test_parallel.py::test_model_axis_shards_only_answer_projection",
    "test_parallel.py::test_uneven_vocab_falls_back_to_replication",
    "test_preemption.py::test_sigterm_checkpoints_and_stops",
    "test_scan.py::test_scan_train_step_runs",
    "test_serve.py::test_serve_k_deep_dispatch",
    "test_serve.py::test_serve_mesh_sharded",
    "test_serve.py::test_serve_roundtrip",
    "test_train_e2e.py::test_overfit_small_subset",
    "test_train_e2e.py::test_resume_continues_training",
})


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        key = f"{item.path.name}::{item.name}"
        if key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


# --------------------------------------------------------------------------
# Cross-module jit-cache release: one pytest process compiles ~400 XLA CPU
# programs over the full suite (interpret-mode Pallas programs are huge on
# CPU); the accumulated executables/tracing caches eventually SIGSEGV the
# XLA CPU compiler near the end of the run (round-4 VERDICT weak #1 — the
# crash reproduced twice at ~85%, in a test that passes in isolation).
# Compiled functions are module-scoped in this suite, so dropping the
# caches at module boundaries frees the dead executables without losing
# meaningful cache hits.

def pytest_runtest_teardown(item, nextitem):
    if nextitem is None or item.path != nextitem.path:
        jax.clear_caches()
