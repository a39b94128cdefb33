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


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--steps", type=int, default=None, help="override total steps")
    args = parser.parse_args(argv)
    setup_logging()
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
