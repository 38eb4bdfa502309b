"""DECAR-v2: k-means oracle parity + end-to-end clustering trainer smoke."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.objectives.decar import decar_ce, kmeans_on_mesh
from audiossl_tpu.config import load_config
from audiossl_tpu.data.make_test_wavs import make

RNG = np.random.default_rng(4)


def _np_spherical_kmeans(emb, centroids, iters):
    """NumPy oracle of utils.py:291-318: dot-product E-step, mean+L2 M-step."""
    for _ in range(iters):
        assign = np.argmax(emb @ centroids.T, axis=1)
        for k in range(len(centroids)):
            m = assign == k
            if m.sum():
                centroids[k] = emb[m].sum(0) / m.sum()
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids, np.argmax(emb @ centroids.T, axis=1)


class TestKmeans:
    def test_matches_numpy_oracle_single_shard(self):
        m, d, k = 64, 8, 4
        emb = RNG.standard_normal((m, d)).astype(np.float32)
        idx = np.arange(m, dtype=np.int32)
        key = jax.random.key(0)
        cents, assigns = kmeans_on_mesh(
            jnp.asarray(emb), jnp.asarray(idx), m, k, key, n_iters=5, axis_name=None
        )
        # oracle with the same init centroids (same permutation choice)
        pick = np.asarray(jax.random.permutation(key, m)[:k])
        ref_c, ref_a = _np_spherical_kmeans(emb.copy(), emb[pick].copy(), 5)
        np.testing.assert_allclose(np.asarray(cents), ref_c, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(assigns), ref_a)

    def test_distributed_matches_single(self):
        """8-shard psum k-means == single-shard k-means on the concatenation."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from audiossl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        w = mesh.devices.size
        m_per, d, k = 16, 8, 4
        emb = RNG.standard_normal((w * m_per, d)).astype(np.float32)
        idx = np.arange(w * m_per, dtype=np.int32)
        key = jax.random.key(1)

        def f(emb_l, idx_l):
            return kmeans_on_mesh(emb_l, idx_l, w * m_per, k, key, 5, "data")

        cents, assigns = jax.jit(
            shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()), check_vma=False)
        )(jnp.asarray(emb), jnp.asarray(idx))
        # shard 0 initializes the centroids; oracle picks from shard-0 slots
        pick = np.asarray(jax.random.permutation(key, m_per)[:k])
        ref_c, ref_a = _np_spherical_kmeans(emb.copy(), emb[:m_per][pick].copy(), 5)
        np.testing.assert_allclose(np.asarray(cents), ref_c, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(assigns), ref_a)

    def test_ignores_unfilled_and_ce_ignore_index(self):
        logits = jnp.asarray(RNG.standard_normal((4, 5)).astype(np.float32))
        t = jnp.asarray([1, -100, 2, -100])
        loss = decar_ce(logits, t)
        keep = decar_ce(logits[jnp.asarray([0, 2])], t[jnp.asarray([0, 2])])
        np.testing.assert_allclose(float(loss), float(keep), rtol=1e-6)


class TestDecarTrainer:
    def test_two_epoch_smoke(self, tmp_path):
        from audiossl_tpu.train.decar_loop import train_decar

        wav_dir = make(str(tmp_path / "wavs"), n=16)
        cfg = load_config(None, "decar_v2")
        cfg["run"].update(batch_size=8, epochs=2, num_dataloader_workers=2,
                          save_path=str(tmp_path / "decar"), learning_rate=0.5)
        cfg["pretrain"]["base_encoder"]["output_dim"] = 64
        cfg["pretrain"]["feat_dim"] = 16
        cfg["pretrain"]["nmb_prototypes"] = [2]  # per-shard memory is tiny here
        cfg["pretrain"]["freeze_prototypes_niters"] = 1
        state, ckpt_dir = train_decar(cfg, os.path.join(wav_dir, "pretrain.csv"), max_epochs=2)
        assert int(state.step) == 4  # 2 epochs x 2 steps
        # after epoch 2's clustering, every sample has an assignment
        assigns = np.asarray(state.assignments[0])
        assert (assigns != -100).all()
        assert os.path.isdir(ckpt_dir)

        # resume: memory bank (the mb{rank}.pth equivalent) survives restore
        state2, _ = train_decar(
            cfg, os.path.join(wav_dir, "pretrain.csv"), load_checkpoint=ckpt_dir, max_epochs=1
        )
        assert int(state2.step) == 6
        assert (np.asarray(state2.memory.index) >= 0).all()  # bank stayed filled
