"""DeepCluster-v1 epoch mode (VERDICT r1 item 9): per-epoch k-means
pseudo-labels + uniform-cluster sampling + CE with a fresh top layer."""
import json
import os

import numpy as np
import pytest

from audiossl_tpu.data.make_test_wavs import make


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("wavs")), n=16)


def _cfg(tmp, epochs=2):
    return {
        "run": {
            "batch_size": 8, "epochs": epochs, "num_dataloader_workers": 2,
            "learning_rate": 0.05, "save_path": os.path.join(tmp, "dc1"),
        },
        "pretrain": {
            "base_encoder": {"type": "AudioNTT2020Task6", "output_dim": 64},
            "num_clusters": 4,
            "normalization": "none",
            "input": {"type": "raw_wav", "sampling_rate": 16000, "length_wave": 0.95, "n_mels": 64},
        },
    }


def test_two_epoch_smoke_and_resume(wav_dir, tmp_path):
    from audiossl_tpu.train import checkpoint as ckpt
    from audiossl_tpu.train.deepcluster_loop import train_deepcluster_v1

    csv = os.path.join(wav_dir, "pretrain.csv")
    result, ckpt_dir = train_deepcluster_v1(_cfg(str(tmp_path)), csv)
    # 16 clips / batch 8 = 2 steps/epoch x 2 epochs
    assert int(result.step) == 4
    # every sample got a cluster id in [0, num_clusters)
    assert result.assignments.shape == (16,)
    assert result.assignments.min() >= 0 and result.assignments.max() < 4
    lines = [json.loads(l) for l in open(os.path.join(ckpt_dir, "stats.jsonl"))]
    assert len(lines) == 4
    assert all(np.isfinite(l["train_loss"]) and np.isfinite(l["kmeans_loss"]) for l in lines)
    assert ckpt.latest_step(ckpt_dir) == 4

    # resume continues at epoch 2 AND at the saved global step, so
    # post-resume checkpoints never land below pre-resume ones
    result2, _ = train_deepcluster_v1(
        _cfg(str(tmp_path), epochs=3), csv, load_checkpoint=ckpt_dir
    )
    assert int(result2.step) == 6  # 4 restored + one more epoch of 2 steps
    assert ckpt.latest_step(ckpt_dir) == 6


def test_reset_subtree_opt_state_reaches_nested_trace():
    """Regression (code-review r2): the momentum trace lives nested inside
    optax.chain state — a top-level hasattr walk misses it entirely."""
    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.train.deepcluster_loop import reset_subtree_opt_state

    tx = optax.chain(optax.add_decayed_weights(1e-5), optax.sgd(0.05, momentum=0.9))
    params = {"encoder": {"w": jnp.ones(3)}, "top_layer": {"kernel": jnp.ones(3)}}
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, st = tx.update(grads, st, params)  # momentum buffers now nonzero

    st2 = reset_subtree_opt_state(st, "top_layer")
    flat = jax.tree_util.tree_leaves_with_path(st2)
    head = [l for p, l in flat if any(getattr(k, "key", "") == "top_layer" for k in p)]
    enc = [l for p, l in flat if any(getattr(k, "key", "") == "encoder" for k in p)]
    assert head and all(float(jnp.abs(l).max()) == 0.0 for l in head)
    assert any(float(jnp.abs(l).max()) > 0.0 for l in enc)  # encoder momentum kept
