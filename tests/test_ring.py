"""Ring attention + blockwise AST over the time-sharded spectrogram
(VERDICT r1 item 10): the 8-shard forward must equal the single-shard
forward — ring attention is exact, not an approximation."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.parallel.mesh import make_mesh
from audiossl_tpu.parallel.ring import (
    LongASTConfig,
    init_long_ast_params,
    long_audio_forward,
    ring_attention,
)

RNG = np.random.default_rng(17)


def test_ring_attention_equals_dense_softmax():
    mesh = make_mesh()
    w = mesh.devices.size
    q = jnp.asarray(RNG.standard_normal((2, 3, 8 * w, 16)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((2, 3, 8 * w, 16)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((2, 3, 8 * w, 16)).astype(np.float32))

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(16.0)
    dense = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)

    spec = P(None, None, "data", None)
    ring = jax.jit(
        shard_map(
            lambda a, b, c: ring_attention(a, b, c, "data"),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )
    )
    out = ring(*(jax.device_put(x, NamedSharding(mesh, spec)) for x in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=2e-5)


def _forward_on_mesh(mesh, params, wave, mel_cfg, cfg):
    f = jax.jit(
        shard_map(
            lambda p, wl: long_audio_forward(p, wl, mel_cfg, cfg, "data"),
            mesh=mesh, in_specs=(P(), P(None, "data")), out_specs=P(), check_vma=False,
        )
    )
    return np.asarray(f(params, jax.device_put(wave, NamedSharding(mesh, P(None, "data")))))


def test_blockwise_ast_sharded_equals_unsharded():
    mel_cfg = LogMelConfig(center=False)
    # 8 shards x 5120 samples (32 frames each, >= the 864-sample halo),
    # time_patch 4 -> 8 tokens/shard, 64 global tokens
    cfg = LongASTConfig(
        n_mels=64, time_patch=4, embed_dim=64, depth=2, num_heads=2,
        tokens_global=64, num_classes=5,
    )
    params = init_long_ast_params(jax.random.key(0), cfg)
    wave = jnp.asarray(0.3 * RNG.standard_normal((2, 8 * 5120)).astype(np.float32))

    logits8 = _forward_on_mesh(make_mesh(), params, wave, mel_cfg, cfg)
    logits1 = _forward_on_mesh(make_mesh(1), params, wave, mel_cfg, cfg)
    assert logits8.shape == (2, 5)
    np.testing.assert_allclose(logits8, logits1, atol=2e-4, rtol=1e-4)


def test_blockwise_ast_grads_flow_sharded():
    mel_cfg = LogMelConfig(center=False)
    cfg = LongASTConfig(
        n_mels=64, time_patch=4, embed_dim=64, depth=1, num_heads=2,
        tokens_global=64, num_classes=0,
    )
    params = init_long_ast_params(jax.random.key(1), cfg)
    mesh = make_mesh()
    wave = jnp.asarray(0.3 * RNG.standard_normal((1, 8 * 5120)).astype(np.float32))
    wave = jax.device_put(wave, NamedSharding(mesh, P(None, "data")))

    def loss(p, wl):
        emb = long_audio_forward(p, wl, mel_cfg, cfg, "data")
        return jnp.sum(emb * emb)

    g_fn = jax.jit(
        shard_map(
            lambda p, wl: jax.grad(loss)(p, wl),
            mesh=mesh, in_specs=(P(), P(None, "data")), out_specs=P(), check_vma=False,
        )
    )
    g = g_fn(params, wave)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
