"""Error decomposition for a trained landmark model (offline diagnostic).

Restores a sweep/final checkpoint (by registry variant name, same workdir
hashing as scripts/sweep_tps.py) and decomposes the landmark-regression eval
error into the quantities the next accuracy lever should target:

  * per-GT-landmark test error — which eval targets carry the residual;
  * heatmap concentration — std (in px) of each landmark's marginal softmax
    distributions (diffuse or multimodal heatmaps read out imprecisely);
  * landmark usage — per-landmark positional std across the eval set (a
    landmark that never moves carries no pose information to the readout)
    and min pairwise distance between landmark mean positions (collapse);
  * readout conditioning — singular-value spectrum of the centered coord
    feature matrix (how many effective dofs the ridge regressor gets).

Runs fine on CPU (JAX_PLATFORMS=cpu) against a TPU-written checkpoint.

Usage:
    python scripts/diagnose_landmarks.py --variant final_ind_2x_k10_noisefeat_equi2_ema_60k \
        [--out docs/artifacts/diagnose_<variant>.md]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--workdir", default=None,
                        help="override the derived sweep workdir")
    parser.add_argument("--steps", type=int, default=None,
                        help="budget the sweep ran this variant at, when it "
                             "was neither baked nor the runner default "
                             "(15000) — part of the workdir key")
    parser.add_argument("--seed", type=int, default=0,
                        help="replicate seed the run trained under (part of "
                             "the workdir key; 0 = historical default)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from imm_tpu.data.synthetic import SyntheticBlobFaces
    from imm_tpu.eval.regression import (
        fit_landmark_regressor,
        predict_landmarks,
        sweep_coords,
    )
    from imm_tpu.experiment import build_experiment
    from imm_tpu.ops.coords import marginal_distributions
    from sweep_tps import VARIANTS, variant_config, variant_workdir

    # Workdir + config come from sweep_tps's own helpers so this diagnostic
    # restores under EXACTLY the config the checkpoint was trained with
    # (duplicating the hash recipe here desynchronized once already).
    variant = VARIANTS[args.variant]
    steps = args.steps or (
        variant.steps if variant.steps is not None else 15_000
    )
    workdir = args.workdir or variant_workdir(args.variant, variant, steps,
                                              seed=args.seed)
    if not os.path.isdir(os.path.join(workdir, "checkpoints")):
        raise SystemExit(f"no checkpoints under {workdir}")
    config = variant_config(args.variant, variant, steps, workdir=workdir,
                            seed=args.seed)
    exp = build_experiment(config, restore=True)
    exp.trainer.restore_or_init()
    state = exp.trainer.state
    step = int(jax.device_get(state.step))
    print(f"[diagnose] restored {args.variant} at step {step}")

    faces = SyntheticBlobFaces(image_size=config.model.image_size)
    n = config.eval_samples
    sample = jax.jit(lambda r: faces.sample(r, n))
    # identical split keys to experiment.py's synthetic eval_builder
    train_split = jax.device_get(sample(jax.random.PRNGKey(91)))
    test_split = jax.device_get(sample(jax.random.PRNGKey(92)))

    model = exp.model

    def coords_and_heat(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, method=model.encode_pose)

    heat_fn = jax.jit(lambda p, bs, im: coords_and_heat(p, bs, im)[1])
    coords_fn = jax.jit(lambda p, bs, im: coords_and_heat(p, bs, im)[0])

    pred_train = sweep_coords(
        coords_fn, state.params, state.batch_stats, train_split["image"]
    )
    pred_test = sweep_coords(
        coords_fn, state.params, state.batch_stats, test_split["image"]
    )
    w = fit_landmark_regressor(
        jnp.asarray(pred_train), jnp.asarray(train_split["landmarks"])
    )
    pred_lm = np.asarray(predict_landmarks(w, jnp.asarray(pred_test)))
    gt = test_split["landmarks"]
    iod = np.linalg.norm(gt[:, 0] - gt[:, 1], axis=-1)  # (N,)
    # per-GT-landmark mean error, % of inter-ocular distance
    per_gt = (
        np.linalg.norm(pred_lm - gt, axis=-1) / iod[:, None]
    ).mean(axis=0) * 100.0  # (K_gt,)

    # heatmap concentration on one eval chunk
    heat = np.asarray(
        heat_fn(state.params, state.batch_stats,
                jnp.asarray(test_split["image"][:256]))
    )
    py, px = marginal_distributions(jnp.asarray(heat))
    py, px = np.asarray(py), np.asarray(px)  # (B, H, K), (B, W, K)
    h, wdt = heat.shape[1], heat.shape[2]
    img = config.model.image_size

    def marg_std_px(p, size):  # std of the marginal, in image pixels
        ruler = np.linspace(-1.0, 1.0, size)[None, :, None]
        mean = (p * ruler).sum(1, keepdims=True)
        var = (p * (ruler - mean) ** 2).sum(1)
        return np.sqrt(var).mean(0) * img / 2.0  # (K,)

    heat_std = (marg_std_px(py, h) + marg_std_px(px, wdt)) / 2.0

    # landmark usage: positional std + collapse check, in image pixels
    pos_std = pred_test.std(axis=0).mean(axis=-1) * img / 2.0  # (K,)
    means = pred_test.mean(axis=0)  # (K, 2)
    d = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    min_pair_px = d.min() * img / 2.0

    # readout conditioning: singular values of centered features
    feats = pred_test.reshape(pred_test.shape[0], -1)
    sv = np.linalg.svd(feats - feats.mean(0), compute_uv=False)
    sv_norm = sv / sv[0]

    lines = [
        f"# Landmark-error decomposition: {args.variant} @ step {step}",
        "",
        f"Eval split: synthetic keys 91/92, n={n}. Image {img}px, "
        f"K={config.model.n_landmarks} unsupervised landmarks, "
        f"{gt.shape[1]} GT targets.",
        "",
        "## Per-GT-target test error (%IOD)",
        "",
        "| target | err %IOD |",
        "|---|---|",
    ]
    for i, e in enumerate(per_gt):
        lines.append(f"| {i} | {e:.2f} |")
    lines += [
        "",
        f"Overall test: **{per_gt.mean():.2f} %IOD** "
        "(mean of per-target rows).",
        "",
        "## Unsupervised landmark stats",
        "",
        "| k | heatmap marginal std (px) | positional std (px) |",
        "|---|---|---|",
    ]
    for k in range(heat_std.shape[0]):
        lines.append(f"| {k} | {heat_std[k]:.1f} | {pos_std[k]:.1f} |")
    lines += [
        "",
        f"Min pairwise distance between landmark means: "
        f"**{min_pair_px:.1f} px** (collapse if ~0).",
        "",
        "## Readout conditioning",
        "",
        "Normalized singular values of the centered (N, 2K) coord features: "
        + ", ".join(f"{v:.3f}" for v in sv_norm),
        "",
        f"Effective rank (sv > 0.01·sv0): "
        f"{int((sv_norm > 0.01).sum())} / {len(sv_norm)}",
    ]
    out = args.out or f"docs/artifacts/diagnose_{args.variant}.md"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"[diagnose] wrote {out}")


if __name__ == "__main__":
    main()
