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

import pytest  # noqa: E402

# Test tiers (VERDICT r2 item 9): `pytest -m quick` is the edit loop;
# modules listed here are wholly `slow` (measured with --durations on this
# box — MViT-family oracles/transplants, e2e trainers, subprocess pods).
# Individual tests elsewhere can also carry @pytest.mark.slow.
SLOW_MODULES = {
    "test_mast",
    "test_mvit_oracle",
    "test_mvit_fused",
    "test_torch_import",
    "test_surgery",
    "test_finetune_mast",
    "test_e2e",
    "test_graft_entry",
    "test_multiprocess_pod",
    "test_reference_equiv",
    "test_reference_equiv_mast",
    "test_reference_equiv_downstream",
    "test_preemption",  # two e2e delores_s runs + multi-second SIGTERM waits
    "test_kmix_e2e",  # three pretrain compiles + a clustering pass
    "test_fullstack_parity",  # both frameworks' full pipelines, 24 steps each
    "test_fbank_composition_parity",  # reference AudiosetDataset + two tiny-MViT pretrains
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = os.path.basename(item.nodeid.split("::")[0]).removesuffix(".py")
        if module in SLOW_MODULES and item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.slow)
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)
