"""Train an IMM model.  ``python -m imm_tpu.cli.train --preset synthetic``"""

from __future__ import annotations

import argparse
import logging

from imm_tpu.cli._common import (
    add_config_args,
    enable_compile_cache,
    resolve_config,
    setup_logging,
)

log = logging.getLogger("imm_tpu")


def _strip_supervise(argv: list[str]) -> list[str]:
    """Remove --supervise[=N] (and its value form) from an argv list."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == "--supervise":
            skip = True
            continue
        if a.startswith("--supervise="):
            continue
        out.append(a)
    return out


def _supervise(restarts: int, argv=None) -> int:
    """Run this CLI as a child process, restarting on failure.

    Completes the failure-recovery chain (SURVEY.md §5): the Trainer's stall
    watchdog aborts a wedged run; this loop relaunches it; Orbax resumes from
    the latest checkpoint. Requires --workdir so there is something to
    resume from.
    """
    import subprocess
    import sys

    import time

    child_argv = _strip_supervise(list(argv) if argv is not None else sys.argv[1:])
    cmd = [sys.executable, "-u", "-m", "imm_tpu.cli.train", *child_argv]
    for attempt in range(restarts + 1):
        t0 = time.monotonic()
        code = subprocess.call(cmd)
        child_runtime = time.monotonic() - t0
        if code == 0:
            return 0
        log.warning(
            "training exited with code %d (attempt %d/%d) — restarting; "
            "Orbax resumes from the latest checkpoint",
            code, attempt + 1, restarts,
        )
        # a TPU process started within seconds of the previous one exiting
        # reliably wedges at device init through the axon relay — pause
        # before relaunching (same spacing the sweep retry shells use).
        # Instant failures (bad flag, config typo) never touched the device,
        # so they skip the pause and fail fast.
        if attempt < restarts and child_runtime > 10:
            time.sleep(50)
    return code


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--steps", type=int, default=None, help="override total steps")
    parser.add_argument(
        "--supervise", type=int, default=0, metavar="N",
        help="restart training up to N times on failure (pairs with the "
        "stall watchdog + checkpoint auto-resume)",
    )
    args = parser.parse_args(argv)
    setup_logging()
    if args.supervise:
        if not args.workdir:
            raise SystemExit("--supervise requires --workdir (for resume)")
        raise SystemExit(_supervise(args.supervise, argv))
    # Multi-host process group, before any backend-touching JAX call.
    # No-op when no coordinator is configured (single host, this machine).
    from imm_tpu.parallel.distributed import initialize_multihost

    initialize_multihost()
    enable_compile_cache()
    config = resolve_config(args)

    from imm_tpu.experiment import build_experiment

    exp = build_experiment(config, total_steps=args.steps)
    log.info(
        "experiment %s: %d steps, batch %d x %d/call, mesh %s",
        config.name,
        exp.trainer.total_steps,
        config.train.batch_size,
        config.train.steps_per_call,
        dict(exp.mesh.shape),
    )
    state = exp.run()
    log.info("finished at step %d", int(state.step))
    if exp.eval_fn is not None:
        results = exp.eval_fn(state)
        for k, v in results.items():
            log.info("final %s = %.4f", k, v)
    return state


if __name__ == "__main__":
    main()
