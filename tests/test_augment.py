"""Augmentation pipeline: mixup bank ring buffer, Kmix selection, pipeline wiring."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audiossl_tpu.data.augment import (
    AugmentConfig,
    AugmentPipeline,
    MixupBankState,
    kmix_partner_index,
    log_mixup_exp,
    mix_gaussian_noise,
    mixup_bank_init,
    mixup_bank_push,
    mixup_byola,
)

RNG = np.random.default_rng(2)


def _batch(b=4, f=8, t=12):
    return jnp.asarray(RNG.standard_normal((b, 1, f, t)).astype(np.float32))


class TestMixupBank:
    def test_push_and_wrap(self):
        st = mixup_bank_init(8, 4, 4)
        x = jnp.ones((6, 1, 4, 4))
        st = mixup_bank_push(st, x)
        assert int(st.fill) == 6 and int(st.ptr) == 6
        st = mixup_bank_push(st, 2 * x)
        assert int(st.fill) == 8 and int(st.ptr) == 4
        bank = np.asarray(st.bank, np.float32)
        # slots 6,7 and 0..3 hold the second push (value 2), 4,5 the first
        np.testing.assert_array_equal(bank[[6, 7, 0, 1, 2, 3]], 2.0)
        np.testing.assert_array_equal(bank[[4, 5]], 1.0)

    def test_mixup_identity_when_empty(self):
        st = mixup_bank_init(8, 8, 12)
        x = _batch()
        out = mixup_byola(st, x, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_mixup_formula(self):
        # Bank with a single known entry: output must equal log-mixup-exp of it.
        st = mixup_bank_init(4, 8, 12)
        z = _batch(1)
        st = mixup_bank_push(st, z)
        x = _batch(3)
        out = np.asarray(mixup_byola(st, x, jax.random.key(1), ratio=0.4))
        ex = np.asarray(x)
        ez = np.asarray(z[0:1].astype(jnp.bfloat16).astype(jnp.float32))
        lo = np.log(0.6 * np.exp(ex) + 0.4 * ez.repeat(3, 0) * 0 + 1e-12)  # bound check below instead
        # alpha in [0, 0.4]: mixed must lie between x and full 0.4-mix envelope
        full = np.log(0.6 * np.exp(ex) + 0.4 * np.exp(ez) + 1.1920929e-7)
        lo_env = np.minimum(ex, full) - 1e-4
        hi_env = np.maximum(ex, full) + 1e-4
        assert (out >= lo_env).all() and (out <= hi_env).all()

    def test_log_mixup_exp_alpha1_is_identity(self):
        x = _batch(1)
        out = log_mixup_exp(x, jnp.zeros_like(x), jnp.asarray(1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-4)


class TestKmix:
    def test_partner_from_farthest_cluster(self):
        # 2 well-separated centroids along the first mel bin; query sits on c0,
        # so the reference's farthest-first ranking must pick a c1-assigned item.
        f, t = 4, 6
        centroids = np.zeros((2, f), np.float32)
        centroids[0, 0] = 1.0
        centroids[1, 1] = 1.0
        st = mixup_bank_init(8, f, t)
        near = np.zeros((3, 1, f, t), np.float32)
        near[:, 0, 0, :] = 5.0  # assigned to c0
        far = np.zeros((2, 1, f, t), np.float32)
        far[:, 0, 1, :] = 5.0  # assigned to c1
        st = mixup_bank_push(st, jnp.asarray(near))
        st = mixup_bank_push(st, jnp.asarray(far))
        x = jnp.asarray(near[0])
        idx = int(
            kmix_partner_index(st, x, jnp.asarray(centroids), jax.random.key(0), top_k=2)
        )
        assert idx in (3, 4)  # the far-cluster items

    def test_ignores_unfilled_slots(self):
        f, t = 4, 6
        centroids = jnp.eye(2, f)
        st = mixup_bank_init(16, f, t)
        item = np.zeros((2, 1, f, t), np.float32)
        item[:, 0, 1, :] = 1.0
        st = mixup_bank_push(st, jnp.asarray(item))
        idx = int(
            kmix_partner_index(st, jnp.asarray(item[0]), centroids, jax.random.key(1), top_k=2)
        )
        assert idx < 2


class TestPipeline:
    def _cfg(self, **kw):
        base = dict(
            mixup_ratio=0.4, rrc=True, normalization="mean_var", n_memory=16, kmix_ratio=None
        )
        base.update(kw)
        return AugmentConfig(**base)

    def test_two_views_differ_and_state_advances(self):
        pipe = AugmentPipeline(self._cfg(), epoch_samples=100)
        st = pipe.init_state(8, 12)
        x = _batch(4)
        st2, v1, v2 = pipe(st, x, jax.random.key(0))
        assert v1.shape == x.shape == v2.shape
        assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-3
        assert int(st2.mixup.fill) == 8  # both views pushed
        assert int(st2.running_norm.n) == 4

    def test_jit_compatible(self):
        pipe = AugmentPipeline(self._cfg(), epoch_samples=100)
        st = pipe.init_state(8, 12)
        f = jax.jit(lambda s, x, k: pipe(s, x, k))
        st2, v1, v2 = f(st, _batch(4), jax.random.key(0))
        assert np.isfinite(np.asarray(v1)).all()

    def test_from_dict_matches_reference_yaml(self):
        pretrain = {
            "normalization": "mean_var",
            "augmentations": {
                "MixupBYOLA": {"ratio": 0.4, "log_mixup_exp": True},
                "Kmix": {"ratio": 0.4, "log_mixup_exp": True, "top_k": 128, "centroid_path": "None"},
                "PatchDrop": {"ratio": 0.3},
                "RandomResizeCrop": {
                    "virtual_crop_scale": [1.0, 1.5],
                    "freq_crop_scale": [0.6, 1.5],
                    "time_crop_scale": [0.6, 1.5],
                },
            },
        }
        cfg = AugmentConfig.from_dict(pretrain)
        assert cfg.mixup_ratio == 0.4
        assert cfg.kmix_ratio is None  # centroid_path 'None' -> Kmix disabled
        assert cfg.rrc and cfg.normalization == "mean_var"

    def test_gaussian_noise_finite(self):
        out = mix_gaussian_noise(_batch(2), jax.random.key(5))
        assert np.isfinite(np.asarray(out)).all()


REF_KMIX_FIXTURE = "/root/reference/extras/mast_new/mast/tensor_data.pt"


@pytest.mark.skipif(not os.path.exists(REF_KMIX_FIXTURE), reason="reference fixture absent")
def test_kmix_partner_in_reference_eligible_set():
    """Run the partner selection on the reference's own checked-in Kmix
    centroid fixture (extras/mast_new/mast/tensor_data.pt, exercised by
    example.py:16-38) and check our draw lands in the eligible set a torch
    transcription of Kmix.get_index computes: farthest-first centroid
    ranking, first rank with members."""
    import torch

    centroids = torch.load(REF_KMIX_FIXTURE, map_location="cpu").float()  # [128, 128]
    n_c, f = centroids.shape
    t, n_bank = 6, 64
    rng = np.random.default_rng(23)
    bank = (2.0 * rng.standard_normal((n_bank, 1, f, t))).astype(np.float32)
    query = (2.0 * rng.standard_normal((1, f, t))).astype(np.float32)

    # torch transcription (augmentations.py:140-162 / example.py)
    c = centroids / centroids.norm(dim=-1, keepdim=True)
    m = torch.tensor(bank[:, 0].mean(-1))
    m = m / m.norm(dim=-1, keepdim=True)
    assign = torch.argmin(torch.cdist(m, c, p=2), dim=1)  # [n_bank]
    x_avg = torch.tensor(query[0].mean(-1))
    pc = torch.argmin(torch.cdist(x_avg[None], c, p=2), dim=1)[0]
    order = torch.topk(torch.cdist(c, c, p=2)[pc], k=n_c, dim=0).indices  # farthest first
    eligible: list[int] = []
    for r in order.tolist():
        eligible = [j for j in range(n_bank) if int(assign[j]) == r]
        if eligible:
            break
    assert eligible  # sanity: some rank has members

    st = mixup_bank_init(n_bank, f, t)
    st = mixup_bank_push(st, jnp.asarray(bank))
    for key in range(5):  # any draw must stay inside the eligible set
        idx = int(
            kmix_partner_index(
                st, jnp.asarray(query), jnp.asarray(centroids.numpy()),
                jax.random.key(key), top_k=n_bank,
            )
        )
        assert idx in eligible, (idx, eligible)
