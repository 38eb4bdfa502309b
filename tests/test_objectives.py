"""Objective-level tests: loss oracles + one train step per method on the 8-dev mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.models.heads import barlow_loss
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.objectives.delores_m import info_nce, queue_update
from audiossl_tpu.objectives.slicer import cluster_loss
from audiossl_tpu.objectives.unfused import cosine_mse, cross_entropy, kl_batchmean
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train.optim import sgd_torch
from audiossl_tpu.train.step import init_train_state, make_train_step

RNG = np.random.default_rng(3)


def small_config(objective="delores_s"):
    cfg = {
        "run": {"batch_size": 16, "world_size": 8},
        "pretrain": {
            "base_encoder": {"type": "AudioNTT2020Task6", "output_dim": 128, "return_all_layers": False},
            "projection_dim": 32,
            "contrastive_dim": 16,
            "instance_contrastive_dim": 16,
            "cluster_contrastive_dim": 8,
            "num_negatives": 64,
            "lambda_barlow": 5e-5,
            "loss_scale": "1/32",
            "task_label": 11,
            "alpha": 0.7,
            "beta": 0.3,
            "gamma": 0.003,
            "normalization": "mean_var",
            "input": {"type": "raw_wav", "sampling_rate": 16000, "length_wave": 0.95, "n_mels": 64},
            "augmentations": {
                "MixupBYOLA": {"ratio": 0.4, "log_mixup_exp": True},
                "RandomResizeCrop": {
                    "virtual_crop_scale": [1.0, 1.5],
                    "freq_crop_scale": [0.6, 1.5],
                    "time_crop_scale": [0.6, 1.5],
                },
            },
        },
    }
    if objective == "delores_m":
        cfg["pretrain"]["lambda_barlow"] = [5e-5] * 3
        cfg["pretrain"]["base_encoder"]["return_all_layers"] = True
    return cfg


class TestLossOracles:
    def test_barlow_matches_torch(self):
        z1 = RNG.standard_normal((16, 8)).astype(np.float32)
        z2 = RNG.standard_normal((16, 8)).astype(np.float32)
        ours = float(barlow_loss(jnp.asarray(z1), jnp.asarray(z2), lambd=5e-5, scale_loss=1 / 32))
        # torch oracle replicating Projection.forward loss tail (delores_s expert :30-46)
        t1, t2 = torch.tensor(z1), torch.tensor(z2)
        bn = lambda z: (z - z.mean(0)) / torch.sqrt(z.var(0, unbiased=False) + 1e-5)
        c = bn(t1).T @ bn(t2) / 16
        on = torch.diagonal(c).add(-1).pow(2).sum() * (1 / 32)
        off = (c.pow(2).sum() - torch.diagonal(c).pow(2).sum()) * (1 / 32)
        ref = 5e-5 * on + 5e-5 * off
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)

    def test_info_nce_matches_torch(self):
        q = RNG.standard_normal((8, 4)).astype(np.float32)
        k = RNG.standard_normal((8, 4)).astype(np.float32)
        queue = RNG.standard_normal((4, 32)).astype(np.float32)
        ours = float(info_nce(jnp.asarray(q), jnp.asarray(k), jnp.asarray(queue), 0.07))
        l_pos = torch.einsum("nc,nc->n", torch.tensor(q), torch.tensor(k)).unsqueeze(-1)
        l_neg = torch.einsum("nc,ck->nk", torch.tensor(q), torch.tensor(queue))
        logits = torch.cat([l_pos, l_neg], dim=1) / 0.07
        ref = F.cross_entropy(logits, torch.zeros(8, dtype=torch.long))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)

    def test_cluster_loss_matches_torch_reference(self):
        """vs a literal torch transcription of extras/slicer ClusterLoss."""
        ci = torch.softmax(torch.tensor(RNG.standard_normal((8, 5)).astype(np.float32)), dim=1)
        cj = torch.softmax(torch.tensor(RNG.standard_normal((8, 5)).astype(np.float32)), dim=1)
        K = 5
        c = torch.cat((ci.t(), cj.t()), dim=0)
        sim = F.cosine_similarity(c.unsqueeze(1), c.unsqueeze(0), dim=2) / 1.0
        N = 2 * K
        sim_i_j = torch.diag(sim, K)
        sim_j_i = torch.diag(sim, -K)
        positive = torch.cat((sim_i_j, sim_j_i), dim=0).reshape(N, 1)
        mask = torch.ones((N, N)).fill_diagonal_(0)
        for i in range(K):
            mask[i, K + i] = 0
            mask[K + i, i] = 0
        negative = sim[mask.bool()].reshape(N, -1)
        logits = torch.cat((positive, negative), dim=1)
        ref = F.cross_entropy(logits, torch.zeros(N, dtype=torch.long), reduction="sum") / N
        ours = float(cluster_loss(jnp.asarray(ci.numpy()), jnp.asarray(cj.numpy())))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)

    def test_kl_and_mse_match_torch(self):
        a = RNG.standard_normal((6, 9)).astype(np.float32)
        b = RNG.standard_normal((6, 9)).astype(np.float32)
        ours_kl = float(
            kl_batchmean(jax.nn.log_softmax(jnp.asarray(a), axis=1), jax.nn.softmax(jnp.asarray(b), axis=1))
        )
        ref_kl = torch.nn.KLDivLoss(reduction="batchmean")(
            F.log_softmax(torch.tensor(a), dim=1), F.softmax(torch.tensor(b), dim=1)
        )
        np.testing.assert_allclose(ours_kl, float(ref_kl), rtol=1e-4)

        ours_mse = float(cosine_mse(jnp.asarray(a), jnp.asarray(b)))
        na, nb = F.normalize(torch.tensor(a), dim=-1), F.normalize(torch.tensor(b), dim=-1)
        ref_mse = (2 - 2 * (na * nb).sum(dim=-1)).mean()
        np.testing.assert_allclose(ours_mse, float(ref_mse), rtol=1e-4)

    def test_cross_entropy_matches_torch(self):
        logits = RNG.standard_normal((6, 9)).astype(np.float32)
        labels = RNG.integers(0, 9, 6)
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


class TestQueue:
    def test_update_semantics(self):
        queue = jnp.zeros((4, 16))
        keys = jnp.ones((8, 4))
        q2, ptr = queue_update(queue, jnp.asarray(0), keys, axis_name=None)
        assert int(ptr) == 8
        np.testing.assert_array_equal(np.asarray(q2[:, :8]), 1.0)
        np.testing.assert_array_equal(np.asarray(q2[:, 8:]), 0.0)
        q3, ptr = queue_update(q2, ptr, 2 * keys, axis_name=None)
        assert int(ptr) == 0
        np.testing.assert_array_equal(np.asarray(q3[:, 8:]), 2.0)


@pytest.mark.parametrize("name", ["delores_s", "delores_m", "slicer", "unfused"])
def test_one_train_step(name):
    cfg = small_config(name)
    mesh = make_mesh()
    obj = get_objective(name)(cfg)
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=32)
    mel_cfg = LogMelConfig()
    tx = sgd_torch(0.03)
    B, L = 16, 15200
    labeled = getattr(obj, "labeled", False)
    state = init_train_state(obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), B // 8, L, labeled=labeled)
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, labeled=labeled)
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    labels = shard_batch(mesh, jnp.asarray(RNG.integers(0, 11, B).astype(np.int32))) if labeled else None

    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = step(state, waves, labels)
    state, metrics = step(state, waves, labels)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(state.step) == 2
    assert np.abs(np.asarray(jax.tree.leaves(state.params)[0]) - p0).max() > 0

    if name in ("delores_m", "slicer"):
        per_dir = 2 if name == "slicer" else 1  # slicer enqueues both directions
        assert int(state.ssl_state.queue_ptr) == (2 * per_dir * B) % cfg["pretrain"]["num_negatives"]
        # momentum params moved toward query params
        pk = jax.tree.leaves(state.ssl_state.params_k)[0]
        assert np.isfinite(np.asarray(pk)).all()


def test_parse_scale_forms():
    """loss_scale accepts 'a/b' fractions and plain numerics without eval()
    (reference config writes the Barlow scale as the string '1/32')."""
    from audiossl_tpu.objectives.delores_m import _parse_scale

    assert _parse_scale("1/32") == 1.0 / 32.0
    assert _parse_scale(" 3/4 ") == 0.75
    assert _parse_scale(0.5) == 0.5
    assert _parse_scale("0.125") == 0.125
    with pytest.raises(ValueError):
        _parse_scale("__import__('os')")
    with pytest.raises(ValueError):
        _parse_scale("1/0")
