"""Generate the golden-logits corpus (tests/golden/logits_<variant>.npz).

Locks numerics across rounds (VERDICT round-1 missing #1): frozen seeds,
small config, f32 on CPU.  Each archive stores the full flattened param
tree AND the eval logits, so a future failure separates init drift
(params differ) from forward-math drift (same params, different logits).

Regenerate ONLY for a deliberate, documented numerics change:

    python tests/golden/generate.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


def flatten_params(params, prefix=()):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix + (k,)))
        else:
            out[".".join(prefix + (k,))] = np.asarray(v)
    return out


def build(variant):
    from tests.test_model import make_embedding_init, make_inputs
    from tests.test_golden import golden_cfg
    from mac_network_tpu.models import MACNetwork
    cfg = golden_cfg(variant)
    emb = make_embedding_init(cfg)
    qs, lengths, images, _ = make_inputs(seed=123)
    extra = {}
    kb_kw = {}
    if variant == "gqa_mask":
        # object features with adversarial garbage in the PADDED slots:
        # the frozen logits lock that kb_lengths masks them exactly
        rng = np.random.RandomState(321)
        B = qs.shape[0]
        _, n_obj_max, obj_d = cfg.imageDims
        images = rng.randn(B, 1, n_obj_max, obj_d).astype(np.float32)
        kbl = rng.randint(3, n_obj_max + 1, size=(B,)).astype(np.int32)
        for b in range(B):
            if kbl[b] < n_obj_max:
                images[b, :, kbl[b]:] = 100.0 * rng.randn(
                    1, n_obj_max - kbl[b], obj_d)
        import jax.numpy as jnp
        images = jnp.asarray(images)
        extra["kbLengths"] = kbl
        kb_kw = {"kb_lengths": jnp.asarray(kbl)}
    model = MACNetwork(cfg, emb)
    rngs = {"params": jax.random.key(7), "dropout": jax.random.key(8)}
    variables = model.init(rngs, qs, lengths, images, **kb_kw)
    logits, _ = model.apply(variables, qs, lengths, images, train=False,
                            **kb_kw)
    return variables["params"], (qs, lengths, images), np.asarray(logits), extra


def main():
    from tests.test_golden import ALL_GOLDEN
    import flax
    force = "--force" in sys.argv
    for variant in ALL_GOLDEN:
        path = os.path.join(GOLDEN_DIR, f"logits_{variant}.npz")
        if os.path.exists(path) and not force:
            # existing archives are the lock — never silently regenerate
            # (pass --force for a deliberate, documented numerics change)
            print(f"{path}: exists, skipping (use --force to regenerate)")
            continue
        params, (qs, lengths, images), logits, extra = build(variant)
        flat = {f"param.{k}": v for k, v in flatten_params(params).items()}
        np.savez_compressed(
            path,
            questions=np.asarray(qs), lengths=np.asarray(lengths),
            images=np.asarray(images), logits=logits,
            jax_version=np.asarray(jax.__version__),
            flax_version=np.asarray(flax.__version__),
            **extra, **flat)
        print(f"{path}: logits {logits.shape}, "
              f"{len(flat)} param leaves, |logits| max "
              f"{np.abs(logits).max():.4f}")


if __name__ == "__main__":
    main()
