"""Regenerate the tensor-parallel downstream e2e artifact (exp/verify_tp).

Drives the REAL `downstream.tp=2` AST probe over a (4, 2) dp x tp CPU mesh
on separable synthetic data for enough epochs to beat chance, so the
artifact evidences *training*, not just step liveness (VERDICT r4 Weak #5 /
Next #6). Run from the repo root:

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/verify_tp_probe.py

Exits non-zero unless the frozen-probe accuracy clearly beats 4-class
chance (0.25). Wall clock is dominated by the one AST-small compile
(~6 min on this box); the 30 training epochs afterwards are milliseconds.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("AUDIOSSL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import tempfile

    from audiossl_tpu.config import load_config
    from audiossl_tpu.data.make_test_wavs import make
    from audiossl_tpu.downstream.probe import run_downstream

    wav_dir = make(tempfile.mkdtemp(prefix="verify_tp_wavs_"), n=16)
    cfg = load_config(None, "downstream")
    cfg["run"].update(batch_size=8, epochs=30, lr=0.01, num_dataloader_workers=2)
    cfg["downstream"]["base_encoder"].update(type="AST", output_dim=384, model_size="small")
    cfg["downstream"]["tp"] = 2
    result = run_downstream(
        cfg,
        {
            "task": "verify_tp",
            "train_csv": os.path.join(wav_dir, "downstream_train.csv"),
            "test_csv": os.path.join(wav_dir, "downstream_test.csv"),
            "freeze": True,
            "exp_dir": os.path.join(REPO, "exp"),
        },
    )
    acc = result["best_test_acc"]
    print(f"verify_tp: best_test_acc {acc:.4f} (chance 0.25)")
    # the artifact must evidence training, not liveness: frozen random-AST
    # features + a linear head separate 4 sine classes far above chance
    assert acc >= 0.5, f"tp probe failed to beat chance by a margin: {acc}"


if __name__ == "__main__":
    main()
