"""Bounded first-touch device init (utils/device_init.py).

The production failure this guards: a wedged axon relay blocks the first
jax.devices() of a process for ~25 min before failing; the bound turns that
into a fast exit the supervise/retry loops cycle on.
"""

import time

import pytest

from imm_tpu.utils.device_init import (
    DeviceInitTimeout,
    _call_with_timeout,
    devices_or_timeout,
)


def test_timeout_raises_on_blocked_call():
    with pytest.raises(DeviceInitTimeout, match="blocked for 1s"):
        _call_with_timeout(lambda: time.sleep(5), timeout_s=1, what="probe")


def test_fast_call_passes_through_and_alarm_is_disarmed():
    assert _call_with_timeout(lambda: 42, timeout_s=5, what="probe") == 42
    time.sleep(0.05)  # a leaked alarm would fire asynchronously


def test_zero_timeout_disables_bound():
    assert _call_with_timeout(lambda: "ok", timeout_s=0, what="probe") == "ok"


def test_devices_or_timeout_on_initialized_backend():
    # the suite's conftest has already initialized the CPU backend, so this
    # takes the instant already-initialized path
    devs = devices_or_timeout(timeout_s=1)
    assert len(devs) >= 1
