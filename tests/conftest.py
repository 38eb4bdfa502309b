"""Test config: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4:
multi-device tests run on CPU with xla_force_host_platform_device_count).
"""
import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel ("axon"),
# but tests must run on the simulated multi-device CPU mesh.
if not os.environ.get("AUDIOSSL_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep XLA/CPU from oversubscribing the test machine.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
