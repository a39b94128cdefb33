"""Pose-swap generation: appearance of A in the pose of B (driver config 5).

``python -m imm_tpu.cli.generate --preset swap --workdir runs/x \
    --out swaps.npy [--appearance a.png --pose b.png]``
Without input images, draws a batch from the experiment's data source and
produces the full swap grid. See SURVEY.md §3.4.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

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
    parser.add_argument("--appearance", default=None, help="appearance image path")
    parser.add_argument("--pose", default=None, help="pose image path")
    parser.add_argument("--n", type=int, default=8, help="grid size without inputs")
    parser.add_argument("--out", default="swaps.npy", help="output .npy/.png path")
    parser.add_argument(
        "--ema", action="store_true",
        help="generate with the Polyak-averaged params (requires a checkpoint "
        "trained with train.param_ema_decay > 0)",
    )
    args = parser.parse_args(argv)
    setup_logging()
    enable_compile_cache()
    config = resolve_config(args)

    import jax

    from imm_tpu.data.datasets import _load_image
    from imm_tpu.data.synthetic import SyntheticBlobFaces
    from imm_tpu.eval import pose_swap
    from imm_tpu.experiment import build_experiment

    exp = build_experiment(config, total_steps=0, inference_only=True)
    state = exp.trainer.restore_or_init()
    s = config.model.image_size

    if args.appearance and args.pose:
        app = _load_image(args.appearance, s, None)[None]
        pose = _load_image(args.pose, s, None)[None]
    else:
        faces = SyntheticBlobFaces(image_size=s)
        app = np.asarray(faces.sample(jax.random.PRNGKey(1), args.n)["image"])
        pose = np.asarray(faces.sample(jax.random.PRNGKey(2), args.n)["image"])

    params = state.params
    if args.ema:
        if state.ema_params is None:
            raise SystemExit(
                "--ema: checkpoint has no EMA params (train with "
                "train.param_ema_decay > 0)"
            )
        params = state.ema_params
    out = np.asarray(
        pose_swap(exp.model, params, state.batch_stats, app, pose)
    )
    out = np.clip(out, 0.0, 1.0)
    if args.out.endswith(".npy"):
        np.save(args.out, out)
    else:
        import cv2

        grid = np.concatenate(
            [np.concatenate(list(row), axis=1) for row in (app, pose, out)], axis=0
        )
        cv2.imwrite(args.out, cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    log.info("wrote %s (%s)", args.out, out.shape)
    return out


if __name__ == "__main__":
    main()
