"""Offline clustering toolbox + aux losses + layer-decay optimizer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.objectives.clustering import (
    Kmeans,
    PIC,
    kmeans_l2,
    knn_graph,
    pca_whiten,
    uniform_label_epoch,
)
from audiossl_tpu.objectives.dino import dino_init, dino_loss, teacher_temp_schedule
from audiossl_tpu.objectives.slicer import instance_loss

RNG = np.random.default_rng(8)


def _blobs(n_per=30, k=3, d=16, spread=0.05):
    cents = RNG.standard_normal((k, d)) * 3
    pts = np.concatenate([c + spread * RNG.standard_normal((n_per, d)) for c in cents])
    labels = np.repeat(np.arange(k), n_per)
    return pts.astype(np.float32), labels


class TestPCA:
    def test_whitened_dims_and_norm(self):
        x = RNG.standard_normal((200, 32)).astype(np.float32)
        out = pca_whiten(x, dim=8)
        assert out.shape == (200, 8)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


class TestKmeans:
    def test_recovers_blobs(self):
        x, labels = _blobs()
        assign, cents, loss = kmeans_l2(jnp.asarray(x), 3, jax.random.key(0))
        assign = np.asarray(assign)
        # cluster purity: each true blob maps to one cluster
        for c in range(3):
            vals = assign[labels == c]
            assert (vals == vals[0]).all()

    def test_reference_api(self):
        x, _ = _blobs()
        km = Kmeans(3, pca_dim=8)
        loss = km.cluster(x)
        assert len(km.images_lists) == 3
        assert sum(len(l) for l in km.images_lists) == len(x)
        assert np.isfinite(loss)


class TestPIC:
    def test_clusters_blobs(self):
        x, labels = _blobs(n_per=20)
        pic = PIC(nnn=5)
        pic.cluster(x)
        assert sum(len(l) for l in pic.images_lists) == len(x)
        assert len(pic.images_lists) >= 2

    def test_knn_graph_shapes(self):
        x, _ = _blobs(n_per=10)
        I, D = knn_graph(pca_whiten(x, 8), 5)
        assert I.shape == (30, 6) and D.shape == (30, 6)
        np.testing.assert_array_equal(I[:, 0], np.arange(30))  # self first

    def test_device_pic_matches_host(self):
        """run_pic_device (gather/scatter matvec + pointer doubling) must
        produce the same partition as the host scipy path, including on
        unstructured data where the pointer forest is nontrivial."""
        from audiossl_tpu.objectives.clustering import run_pic, run_pic_device

        for x in (_blobs(n_per=20)[0], RNG.standard_normal((70, 12)).astype(np.float32)):
            I, D = knn_graph(pca_whiten(x, 8), 5)
            host = run_pic(I, D)
            dev = run_pic_device(I, D)
            # identical partitions => identical labels (both id clusters in
            # first-root-node order)
            np.testing.assert_array_equal(host, dev)

    def test_device_pic_reference_api(self):
        x, _ = _blobs(n_per=15)
        host, dev = PIC(nnn=5), PIC(nnn=5, device=True)
        host.cluster(x)
        dev.cluster(x)
        assert sorted(map(sorted, host.images_lists)) == sorted(map(sorted, dev.images_lists))


class TestUniformLabelEpoch:
    def test_balanced_sampling(self):
        lists = [[0, 1], [2, 3, 4, 5, 6, 7, 8, 9], []]
        idx = uniform_label_epoch(lists, 12, np.random.default_rng(0))
        assert len(idx) == 12
        small = np.isin(idx, [0, 1]).sum()
        assert small >= 4  # oversampled vs its natural 2/10 share


class TestDino:
    def test_loss_and_center_update(self):
        s = jnp.asarray(RNG.standard_normal((8, 16)).astype(np.float32))
        t = jnp.asarray(RNG.standard_normal((8, 16)).astype(np.float32))
        state = dino_init(16)
        loss, new_state = dino_loss(s, t, state, teacher_temp=0.04, simplified=False)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert np.abs(np.asarray(new_state.center)).max() > 0
        sched = teacher_temp_schedule(0.04, 0.07, 10, 30)
        assert len(sched) == 30 and sched[0] == 0.04 and sched[-1] == 0.07


class TestInstanceLoss:
    def test_matches_torch_reference(self):
        import torch
        import torch.nn.functional as F

        b = 6
        zi = torch.tensor(RNG.standard_normal((b, 8)).astype(np.float32))
        zj = torch.tensor(RNG.standard_normal((b, 8)).astype(np.float32))
        temp = 0.5
        z = torch.cat((zi, zj), dim=0)
        sim = torch.matmul(z, z.T) / temp
        sim_i_j = torch.diag(sim, b)
        sim_j_i = torch.diag(sim, -b)
        n = 2 * b
        positive = torch.cat((sim_i_j, sim_j_i), dim=0).reshape(n, 1)
        mask = torch.ones((n, n)).fill_diagonal_(0)
        for i in range(b):
            mask[i, b + i] = 0
            mask[b + i, i] = 0
        negative = sim[mask.bool()].reshape(n, -1)
        logits = torch.cat((positive, negative), dim=1)
        ref = F.cross_entropy(logits, torch.zeros(n, dtype=torch.long), reduction="sum") / n
        ours = float(instance_loss(jnp.asarray(zi.numpy()), jnp.asarray(zj.numpy()), temp))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


class TestLayerDecay:
    def test_masks_and_scales(self):
        from audiossl_tpu.train.layer_decay import adamw_layer_decay, layer_decay_mask, weight_decay_mask

        params = {
            "patch_embed": {"kernel": jnp.zeros((3, 3, 1, 8)), "bias": jnp.zeros((8,))},
            "block0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24))}, "rel_pos_h": jnp.zeros((5, 4))}},
            "block1": {"mlp": {"kernel": jnp.zeros((8, 8))}},
            "norm": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        }
        scales = layer_decay_mask(params, depth=2, decay=0.5)
        assert scales["patch_embed"]["kernel"] == 0.5**3
        assert scales["block0"]["attn"]["qkv"]["kernel"] == 0.5**2
        assert scales["block1"]["mlp"]["kernel"] == 0.5**1
        assert scales["norm"]["scale"] == 1.0
        wd = weight_decay_mask(params)
        assert wd["block0"]["attn"]["qkv"]["kernel"] is True
        assert wd["block0"]["attn"]["rel_pos_h"] is False  # no-decay token
        assert wd["norm"]["bias"] is False
        tx = adamw_layer_decay(1e-3, params, depth=2, layer_decay=0.5)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["block1"]["mlp"]["kernel"])).all()
