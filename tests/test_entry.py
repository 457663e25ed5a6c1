"""Driver entry contract.

Round-1 failure mode (MULTICHIP_r01.json): the driver imports
``__graft_entry__`` and calls ``dryrun_multichip(8)`` directly from a
process whose shell env points jax at the single-chip axon TPU — without
pre-setting the virtual-CPU env that the ``__main__`` block sets.  The
function must self-configure.  This test reproduces the driver's exact
call pattern in a subprocess with the hostile env restored.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_contract():
    env = dict(os.environ)
    # undo the conftest's CPU forcing: the driver runs with the raw
    # platform env (axon TPU plugin registered, no device-count flag)
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = env.get("PALLAS_AXON_POOL_IPS") or "127.0.0.1"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=840)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DPxSP sequence-parallel" in proc.stdout
    assert "sharded fused-kernel serving ok" in proc.stdout
    assert "cross-model eval on the mesh ok" in proc.stdout
    assert "checkpoint roundtrip ok" in proc.stdout
