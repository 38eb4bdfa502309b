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
    @staticmethod
    def _load_reference_dino():
        """Import the ACTUAL reference DINOLoss (extras/decar-v2/dino_loss.py)."""
        import importlib.util
        import os

        path = "/root/reference/extras/decar-v2/dino_loss.py"
        if not os.path.exists(path):
            pytest.skip("reference checkout not present")
        spec = importlib.util.spec_from_file_location("ref_dino_loss", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_simplified_matches_reference_forward(self):
        """Our simplified=True path vs the reference's live forward
        (dino_loss.py:24-53): raw student log_softmax, raw teacher, + sign,
        no centering, center buffer untouched."""
        import torch

        mod = self._load_reference_dino()
        ref = mod.DINOLoss(
            out_dim=16, ncrops=2, warmup_teacher_temp=0.04, teacher_temp=0.07,
            warmup_teacher_temp_epochs=10, nepochs=30,
        )
        s = RNG.standard_normal((8, 16)).astype(np.float32)
        t = RNG.standard_normal((8, 16)).astype(np.float32)
        ref_loss = ref(torch.tensor(s), torch.tensor(t), epoch=0).item()
        loss, new_state = dino_loss(
            jnp.asarray(s), jnp.asarray(t), dino_init(16), teacher_temp=0.04
        )
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        # reference never updates its center in the live path; ours advances
        # the EMA state (unused by the simplified loss) — check it matches
        # what the reference's update_center would do at world_size 1.
        assert float(ref.center.abs().max()) == 0.0
        expected = 0.1 * t.sum(0, keepdims=True) / t.shape[0]
        np.testing.assert_allclose(np.asarray(new_state.center), expected, rtol=1e-5)
        sched = teacher_temp_schedule(0.04, 0.07, 10, 30)
        ref_sched = ref.teacher_temp_schedule
        np.testing.assert_allclose(sched, ref_sched, rtol=0)

    def test_full_variant_matches_published_form(self):
        """simplified=False vs a torch transcription of the commented-out
        published-DINO block (dino_loss.py:37-46) for one view pair, with
        the center applied and the update_center EMA (dino_loss.py:55-65)."""
        import torch
        import torch.nn.functional as F

        s = RNG.standard_normal((8, 16)).astype(np.float32)
        t = RNG.standard_normal((8, 16)).astype(np.float32)
        center = RNG.standard_normal((1, 16)).astype(np.float32) * 0.1
        student_temp, teacher_temp, m = 0.1, 0.04, 0.9

        st = torch.tensor(s) / student_temp
        q = F.softmax((torch.tensor(t) - torch.tensor(center)) / teacher_temp, dim=-1)
        ref_loss = torch.sum(-q * F.log_softmax(st, dim=-1), dim=-1).mean().item()
        ref_center = m * center + (1 - m) * t.sum(0, keepdims=True) / t.shape[0]

        state = dino_init(16)._replace(center=jnp.asarray(center))
        loss, new_state = dino_loss(
            jnp.asarray(s), jnp.asarray(t), state, teacher_temp=teacher_temp,
            student_temp=student_temp, center_momentum=m, simplified=False,
        )
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state.center), ref_center, rtol=1e-5)


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
