"""Regression test for the driver's bare multi-chip invocation.

Round-1 failure (VERDICT.md Weak #1): `dryrun_multichip(8)` asserted
"need 8 devices, have 1" unless the caller had pre-set
XLA_FLAGS=--xla_force_host_platform_device_count. The function must be
self-contained: it sets the flag itself and redirects to the CPU backend
when the pinned platform can't supply n devices.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bare_invocation():
    # Mimic the driver: no XLA_FLAGS, no JAX_PLATFORMS=cpu override —
    # whatever platform the session sitecustomize pins stays pinned.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-2000:]}"
    assert "dryrun_multichip(8) OK" in proc.stdout
