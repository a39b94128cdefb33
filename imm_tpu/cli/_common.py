"""Shared CLI plumbing: config resolution + logging setup."""

from __future__ import annotations

import argparse
import logging

from imm_tpu.configs import get_preset
from imm_tpu.utils.config import ExperimentConfig, apply_overrides, load_config


def add_config_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--preset", default=None, help="named preset (see imm_tpu.configs)"
    )
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument(
        "--workdir", default=None, help="checkpoint/log directory"
    )
    parser.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="force a JAX backend (the env default on this machine is the "
        "axon TPU; note JAX_PLATFORMS env is read before sitecustomize and "
        "is ineffective — this flag uses jax.config)",
    )
    parser.add_argument(
        "overrides",
        nargs="*",
        help="dotted overrides, e.g. model.n_landmarks=30 train.batch_size=128",
    )


def resolve_config(args: argparse.Namespace) -> ExperimentConfig:
    import dataclasses

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.config:
        config = load_config(args.config)
    elif args.preset:
        config = get_preset(args.preset)
    else:
        raise SystemExit("provide --preset or --config")
    if args.overrides:
        config = apply_overrides(config, args.overrides)
    if args.workdir:
        config = dataclasses.replace(config, workdir=args.workdir)
    return config


def setup_logging() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
        datefmt="%H:%M:%S",
    )


def enable_compile_cache() -> None:
    """Persistent XLA compile cache — first-compile on this chip is minutes."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
