"""mac_network_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the full
capabilities of stanfordnlp/mac-network.

The MAC (Memory-Attention-Composition) network is a recurrent, fully
differentiable multi-step reasoning model for visual question answering
(CLEVR / NLVR).  This package is a from-scratch, TPU-first re-design of the
TF1 reference implementation (mounted read-only at /root/reference):

  - ``config``    — typed config mirroring the reference's ~150 flags
                    (reference: config.py)
  - ``ops``       — the op library: linear/attention/mul/rnn/cnn primitives
                    (reference: ops.py, mi_gru_cell.py, mi_lstm_cell.py)
  - ``models``    — the MAC cell + network and baselines in Flax
                    (reference: mac_cell.py, model.py)
  - ``data``      — preprocessing: tokenizer, vocab, readers, bucketing
                    (reference: preprocess.py, program_translator.py)
  - ``train``     — training/eval driver: Adam+EMA, LR-plateau decay,
                    checkpointing, CSV logs (reference: main.py)
  - ``parallel``  — jax.sharding Mesh + pjit data/model parallelism
                    (replaces the reference's vestigial multi-GPU towers,
                    model.py:671-679)
  - ``viz``       — attention visualization (reference: visualization.py)

Design stance: functional JAX + Flax modules, ``lax.scan``/unrolled-jit for
the netLength recurrence, static bucketed shapes, bf16 compute on the MXU,
Pallas kernels for the fused per-step MAC hot path, and XLA collectives over
an ICI mesh for scaling.
"""

__version__ = "0.1.0"
