"""EfficientNet-Barlow upstream variant (extras/delores-s models.py path)."""
import numpy as np
import jax
import jax.numpy as jnp

from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train.optim import lars
from audiossl_tpu.train.step import init_train_state, make_train_step

RNG = np.random.default_rng(14)


def test_delores_s_with_efficientnet_and_lars():
    cfg = {
        "run": {"batch_size": 8},
        "pretrain": {
            "base_encoder": {"type": "Efficient_Net", "output_dim": 1280, "return_all_layers": False},
            "projection_dim": 16,
            "lambda_barlow": 5e-5,
            "normalization": "mean_var",
            "input": {"type": "raw_wav", "sampling_rate": 16000, "length_wave": 0.95, "n_mels": 64},
            "augmentations": {"MixupBYOLA": {"ratio": 0.4, "log_mixup_exp": True}},
        },
    }
    mesh = make_mesh()
    obj = get_objective("delores_s")(cfg)
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=16)
    tx = lars(0.5)  # the extras trainer pairs EfficientNet-Barlow with LARS
    B, L = 8, 15200
    state = init_train_state(obj, pipe, LogMelConfig(), tx, mesh, jax.random.key(0), B // mesh.devices.size, L)
    step = make_train_step(obj, pipe, LogMelConfig(), tx, mesh)
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))
    assert "encoder" in state.params and "block6_0" in state.params["encoder"]
