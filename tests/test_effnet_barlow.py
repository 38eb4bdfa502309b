"""EfficientNet-Barlow upstream variant (extras/delores-s models.py path)."""
import numpy as np
import jax
import pytest
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


class TestEfficientNetOracle:
    """Weight-transplant numeric parity vs a torch transcription of
    efficientnet_pytorch's B0 forward (VERDICT r1 Weak #4): same flax
    variables, eval mode, TF-same padding — including even-input stride-2
    and odd-input asymmetric-padding cases."""

    def _variables(self, key):
        from audiossl_tpu.models.efficientnet import EfficientNetB0

        model = EfficientNetB0()
        x0 = jnp.zeros((1, 64, 96, 1), jnp.float32)
        variables = model.init({"params": key}, x0, False)
        # randomize BN stats so normalization actually transforms values
        rng = np.random.default_rng(7)
        stats = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.asarray(
                np.abs(rng.standard_normal(a.shape)) + 0.5
                if path[-1].key == "var"
                else rng.standard_normal(a.shape) * 0.1,
                jnp.float32,
            ),
            variables["batch_stats"],
        )
        return model, {"params": variables["params"], "batch_stats": stats}

    @pytest.mark.parametrize("hw", [(64, 96), (63, 95)])
    def test_matches_torch_transcription(self, hw):
        from tests.oracles.effnet_oracle import effnet_b0_oracle

        model, variables = self._variables(jax.random.key(3))
        x = (0.5 * np.random.default_rng(1).standard_normal((2, *hw, 1))).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.asarray(x), False))
        ref = effnet_b0_oracle(x, variables)
        assert ours.shape == ref.shape == (2, 1280)
        err = np.max(np.abs(ours - ref))
        assert err <= 1e-4, err
