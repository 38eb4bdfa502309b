"""Sequence-parallel log-mel matches the single-device frontend exactly."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.frontend.sp import pad_for_sp, sp_log_mel_local, sp_num_frames
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(13)


def test_sp_log_mel_matches_single_device():
    mesh = make_mesh()
    w = mesh.devices.size
    cfg = LogMelConfig()
    # a "long" clip: 10 s at 16 kHz
    waves = jnp.asarray(0.3 * RNG.standard_normal((2, 160000)).astype(np.float32))

    ref = np.asarray(log_mel(waves, cfg))  # [2, 64, 1001]
    n_frames = sp_num_frames(cfg, 160000)
    assert ref.shape[-1] == n_frames

    padded = pad_for_sp(waves, cfg, w)
    sharded = jax.device_put(padded, NamedSharding(mesh, P(None, "data")))

    f = jax.jit(
        shard_map(
            lambda wl: sp_log_mel_local(wl, cfg, "data"),
            mesh=mesh,
            in_specs=P(None, "data"),
            out_specs=P(None, None, "data"),
            check_vma=False,
        )
    )
    out = np.asarray(f(sharded))  # [2, 64, T_padded/hop], time-sharded
    np.testing.assert_allclose(out[..., :n_frames], ref, atol=2e-3, rtol=1e-5)


def test_sp_output_stays_sharded():
    mesh = make_mesh()
    cfg = LogMelConfig()
    waves = jnp.asarray(0.3 * RNG.standard_normal((1, 64000)).astype(np.float32))
    padded = pad_for_sp(waves, cfg, mesh.devices.size)
    sharded = jax.device_put(padded, NamedSharding(mesh, P(None, "data")))
    f = jax.jit(
        shard_map(
            lambda wl: sp_log_mel_local(wl, cfg, "data"),
            mesh=mesh,
            in_specs=P(None, "data"),
            out_specs=P(None, None, "data"),
            check_vma=False,
        )
    )
    out = f(sharded)
    # the spectrogram's time axis is sharded across the mesh
    assert out.sharding.spec == P(None, None, "data")
