"""Driver contract for ``__graft_entry__`` (VERDICT r1 item 1).

The driver imports the module with JAX already initialized on however many
real devices exist (one axon TPU chip here) and calls
``dryrun_multichip(8)`` directly — no env pre-arrangement. The function must
self-provision a virtual CPU mesh when short on devices.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_from_one_device():
    """Exactly the driver's call pattern: 1 visible device, then dryrun(8)."""
    env = dict(os.environ)
    # parent sees ONE cpu device (no force_host flag), like the driver's
    # single real chip; the child must be spawned by dryrun itself
    env.pop("XLA_FLAGS", None)
    env.pop("_IMM_TPU_DRYRUN_CHILD", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert jax.device_count() == 1, jax.device_count(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True,
        # must exceed the 1200s child budget in __graft_entry__._reexec_on_
        # cpu_mesh, or a slow-but-passing production path fails the test
        timeout=1300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "replicas identical" in proc.stdout


def test_dryrun_multichip_direct_when_devices_present():
    """With >= n devices already visible (this suite's 8-CPU mesh), the
    check runs in-process — the path a real v5e-8 would take."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)
