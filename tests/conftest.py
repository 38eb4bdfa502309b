"""Test config: run everything on a simulated 8-device CPU mesh.

The session interpreter auto-registers the TPU tunnel ("axon") via a
sitecustomize hook and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — redirect jax to CPU post-import (before any backend is initialized)
and force 8 virtual host devices (SURVEY.md §4: multi-device tests run on
CPU with xla_force_host_platform_device_count).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("AUDIOSSL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
