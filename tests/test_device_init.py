"""Bounded first-touch device init (utils/device_init.py).

The production failure this guards: a wedged axon relay blocks the first
jax.devices() of a process inside C++ PJRT client creation for ~25 min
before failing; the watchdog hard-exit turns that into a fast relaunch.
"""

import subprocess
import sys
import time

from imm_tpu.utils.device_init import (
    INIT_TIMEOUT_EXIT_CODE,
    _call_with_timeout,
    devices_or_timeout,
)


def test_blocked_call_hard_exits_with_watchdog_code():
    # a Python-level sleep stands in for the C-blocked init; the watchdog
    # thread's os._exit fires regardless of what the main thread blocks in
    code = (
        "from imm_tpu.utils.device_init import _call_with_timeout; "
        "import time; _call_with_timeout(lambda: time.sleep(30), 1, 'probe')"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=25)
    assert proc.returncode == INIT_TIMEOUT_EXIT_CODE, proc.stderr
    assert "likely wedged" in proc.stderr


def test_fast_call_passes_through_and_watchdog_is_disarmed():
    assert _call_with_timeout(lambda: 42, timeout_s=5, what="probe") == 42
    time.sleep(0.05)  # a leaked timer would os._exit the test process


def test_zero_timeout_disables_bound():
    assert _call_with_timeout(lambda: "ok", timeout_s=0, what="probe") == "ok"


def test_devices_or_timeout_on_initialized_backend():
    import jax

    jax.devices()  # ensure the backend is initialized even standalone
    devs = devices_or_timeout(timeout_s=1)
    assert len(devs) >= 1
