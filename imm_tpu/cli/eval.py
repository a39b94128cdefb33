"""Evaluate a trained model: landmark regression -> %IOD / %size.

``python -m imm_tpu.cli.eval --preset celeba_k10 --workdir runs/x``
Mirrors the reference's ``scripts/test.py`` (SURVEY.md §3.2).
"""

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
    args = parser.parse_args(argv)
    setup_logging()
    enable_compile_cache()
    config = resolve_config(args)

    from imm_tpu.experiment import build_experiment

    exp = build_experiment(config, total_steps=0)
    state = exp.trainer.restore_or_init()
    log.info("evaluating checkpoint at step %d", int(state.step))
    results = exp.eval_fn(state)
    for k, v in results.items():
        log.info("%s = %.4f", k, v)
    print(results)
    return results


if __name__ == "__main__":
    main()
