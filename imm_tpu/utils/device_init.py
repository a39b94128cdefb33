"""Bounded first-touch TPU device initialization.

Through the axon relay, the first ``jax.devices()`` call of a process can
block for ~25 minutes and then fail UNAVAILABLE when the device RPC is
wedged (observed 2026-08-17: five consecutive such cycles while the relay
was down). Healthy init — even the slow path right after another TPU
process exits — completes within a few minutes. Bounding the first touch
turns a wedged init into a fast, clean failure that the supervise/retry
loops (``cli.train --supervise``, the sweep retry shells) can cycle on
~2.5x faster.

The timeout is an infra knob, not a model hyperparameter, so it lives in an
env var: ``IMM_TPU_DEVICE_INIT_TIMEOUT_S`` (default 600; ``0`` disables).
SIGALRM only works in the main thread; elsewhere the call is unbounded.
"""

from __future__ import annotations

import os
import signal
import threading

import jax

_DEFAULT_TIMEOUT_S = 600


class DeviceInitTimeout(RuntimeError):
    """Backend initialization exceeded the bound — likely a wedged relay."""


def _call_with_timeout(fn, timeout_s: int, what: str):
    """Run ``fn()`` under a SIGALRM bound (main thread only)."""
    if timeout_s <= 0 or threading.current_thread() is not threading.main_thread():
        return fn()

    def _raise(signum, frame):
        raise DeviceInitTimeout(
            f"{what} blocked for {timeout_s}s — the axon device RPC is "
            "likely wedged; exiting so a supervise/retry loop can relaunch"
        )

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def _backend_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return bool(getattr(xla_bridge, "_backends", None))
    except Exception:  # private-API drift: assume uninitialized (bound it)
        return False


def devices_or_timeout(timeout_s: int | None = None):
    """``jax.devices()`` with a bound on first-time backend initialization.

    Already-initialized backends return instantly, so the alarm is only
    armed for the first touch. Raises :class:`DeviceInitTimeout` when init
    exceeds the bound instead of blocking a wedged process for ~25 min.
    """
    if timeout_s is None:
        timeout_s = int(
            os.environ.get("IMM_TPU_DEVICE_INIT_TIMEOUT_S", _DEFAULT_TIMEOUT_S)
        )
    if _backend_initialized():
        return jax.devices()
    return _call_with_timeout(jax.devices, timeout_s, "jax.devices() init")
