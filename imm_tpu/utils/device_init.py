"""Bounded first-touch TPU device initialization.

Through the axon relay, the first ``jax.devices()`` call of a process can
block for ~25 minutes and then fail UNAVAILABLE when the device RPC is
wedged (observed 2026-08-17: five consecutive such cycles while the relay
was down). Healthy init — even the slow path right after another TPU
process exits — completes within a few minutes. Bounding the first touch
turns a wedged init into a fast, clean failure that the supervise/retry
loops (``cli.train --supervise``, the sweep retry shells) can cycle on
~2.5x faster.

The wedge blocks inside the PJRT plugin's C++ client creation, where
Python-level signal handlers are deferred until the C call returns — a
SIGALRM bound would fire only after the ~25 min block resolves. The bound
is therefore a watchdog thread that hard-exits the process
(``os._exit(86)``): the process is wedged in native code with nothing
worth cleaning up, and the retry loop treats any nonzero code the same.

The timeout is an infra knob, not a model hyperparameter, so it lives in an
env var: ``IMM_TPU_DEVICE_INIT_TIMEOUT_S`` (default 600; ``0`` disables).
"""

from __future__ import annotations

import os
import sys
import threading

import jax

_DEFAULT_TIMEOUT_S = 600
#: process exit code of the init watchdog (the stall watchdog uses 42)
INIT_TIMEOUT_EXIT_CODE = 86


def _call_with_timeout(fn, timeout_s: int, what: str):
    """Run ``fn()``; hard-exit the process if it blocks past ``timeout_s``."""
    if timeout_s <= 0:
        return fn()

    def _abort():
        sys.stderr.write(
            f"{what} blocked for {timeout_s}s — the axon device RPC is "
            "likely wedged; exiting "
            f"{INIT_TIMEOUT_EXIT_CODE} so a supervise/retry loop can "
            "relaunch (IMM_TPU_DEVICE_INIT_TIMEOUT_S tunes/disables this)\n"
        )
        sys.stderr.flush()
        os._exit(INIT_TIMEOUT_EXIT_CODE)

    timer = threading.Timer(timeout_s, _abort)
    timer.daemon = True
    timer.start()
    try:
        return fn()
    finally:
        timer.cancel()


def _backend_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return bool(getattr(xla_bridge, "_backends", None))
    except Exception:  # private-API drift: assume uninitialized (bound it)
        return False


def devices_or_timeout(timeout_s: int | None = None):
    """``jax.devices()`` with a bound on first-time backend initialization.

    Already-initialized backends return instantly, so the watchdog is only
    armed for the first touch. A wedged init hard-exits the process with
    :data:`INIT_TIMEOUT_EXIT_CODE` instead of blocking ~25 min.
    """
    if timeout_s is None:
        timeout_s = int(
            os.environ.get("IMM_TPU_DEVICE_INIT_TIMEOUT_S", _DEFAULT_TIMEOUT_S)
        )
    if _backend_initialized():
        return jax.devices()
    return _call_with_timeout(jax.devices, timeout_s, "jax.devices() init")
