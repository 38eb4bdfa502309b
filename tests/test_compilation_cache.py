"""Persistent compilation cache wiring (run.compilation_cache_dir).

Restart latency is compile-bound on TPU (MViT-family compiles take minutes;
preemption-resume recompiles every step function). setup_compilation_cache
turns on JAX's persistent cache so relaunches of the same config reuse the
compiled executables. The reference has no equivalent — CUDA contexts die
with the SLURM job (SURVEY.md §5 failure/recovery: resume is data-only).
"""
import os

import jax
import jax.numpy as jnp

from audiossl_tpu.parallel.launch import setup_compilation_cache


def _snapshot():
    return (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )


def _restore(snap):
    jax.config.update("jax_compilation_cache_dir", snap[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", snap[1])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", snap[2])


def test_disabled_by_default(tmp_path):
    snap = _snapshot()
    try:
        assert setup_compilation_cache(None) is None
        assert setup_compilation_cache({}) is None
        assert setup_compilation_cache({"compilation_cache_dir": ""}) is None
    finally:
        _restore(snap)


def test_cache_writes_entries(tmp_path):
    snap = _snapshot()
    d = tmp_path / "jit_cache"
    try:
        got = setup_compilation_cache({"compilation_cache_dir": str(d)})
        assert got == str(d)
        assert d.is_dir()

        # a shape/function this suite compiles nowhere else
        @jax.jit
        def probe(x):
            return jnp.tanh(x @ x.T) * 1.25 + 0.5

        probe(jnp.arange(391.0).reshape(17, 23)).block_until_ready()
        assert any(e.endswith("-cache") for e in os.listdir(d))
    finally:
        _restore(snap)


def test_env_var_overrides_config(tmp_path, monkeypatch):
    snap = _snapshot()
    env_dir = tmp_path / "from_env"
    try:
        monkeypatch.setenv("AUDIOSSL_COMPILATION_CACHE", str(env_dir))
        got = setup_compilation_cache({"compilation_cache_dir": str(tmp_path / "from_cfg")})
        assert got == str(env_dir)
    finally:
        _restore(snap)
