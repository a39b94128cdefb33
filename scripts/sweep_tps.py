"""TPS-pair training-recipe sweep on the synthetic harness.

Round-1 VERDICT item 3: TPS-pair mode floored at 7.36% IOD while temporal
(video-pair) mode reached 2.93% on the same synthetic generator. Hypothesis:
the *individual* warp component — the only pose delta between source and
target in TPS mode — is far smaller (rot 2.5 deg, trans 0.05) than the
temporal mode's independent-pose delta (rot ~14 deg, trans 0.25), so the
source's spatial content features nearly carry the target's pose and the
landmark bottleneck is never forced to. Each variant trains the flagship
K=10 model for --steps optimizer steps and records the eval curve.

Usage:
    python scripts/sweep_tps.py [--steps 15000] [--out PATH.jsonl]

Variants already recorded in --out are skipped, so an interrupted sweep
resumes where it left off (pair with a shell retry loop; the stall watchdog
exits the process on a wedged device RPC).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python scripts/sweep_tps.py` puts scripts/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_IND_4X = [
    "pair.rotsd=[5,10]",
    "pair.scalesd=[0.05,0.1]",
    "pair.transsd=[0.05,0.15]",
    "pair.warpsd=[0.001,0.04]",
]

VARIANTS: dict[str, list[str]] = {
    # round-1 flagship recipe — the 7.36%-at-100k control
    "control": [],
    # individual component ~2x: modest pose delta increase
    "ind_2x": [
        "pair.rotsd=[5,5]",
        "pair.scalesd=[0.05,0.05]",
        "pair.transsd=[0.05,0.1]",
        "pair.warpsd=[0.001,0.02]",
    ],
    # individual component ~4x
    "ind_4x": list(_IND_4X),
    # individual delta matched to the generator's own pose distribution
    # (rot sd 0.25 rad ~ 14 deg, trans +-0.2) — the TPS analog of temporal mode
    "ind_pose_matched": [
        "pair.rotsd=[0,14]",
        "pair.scalesd=[0,0.12]",
        "pair.transsd=[0,0.2]",
        "pair.warpsd=[0.001,0.02]",
    ],
    # sharper re-rendered gaussians on the best warp recipe
    "ind_4x_gauss05": _IND_4X + ["model.gauss_std=0.05"],
    # accuracy guardrail for the half-resolution VGG throughput lever
    "ind_4x_halfvgg": _IND_4X + ["loss.input_scale=2"],
}

# Second pass (results-driven): ind_2x won the first pass (6.39% vs control
# 8.26%, ind_4x well behind at 13.1%@9k — 4x overshoots), so probe between
# 2x and 4x and put the throughput-lever guardrail on the winning base.
_IND_2X = VARIANTS["ind_2x"]
VARIANTS.update(
    {
        "ind_3x": [
            "pair.rotsd=[5,7.5]",
            "pair.scalesd=[0.05,0.075]",
            "pair.transsd=[0.05,0.12]",
            "pair.warpsd=[0.001,0.03]",
        ],
        "ind_2x_halfvgg": _IND_2X + ["loss.input_scale=2"],
        "ind_2x_gauss05": _IND_2X + ["model.gauss_std=0.05"],
    }
)

# Third pass — on the champion base (ind_3x warp 6.25% + half-res VGG,
# which is accuracy-POSITIVE: 6.07 vs 6.39 on the 2x base, 7.08 vs 9.01 on
# 4x). Levers: throughput beyond half-res (VERDICT item 4 — speed must not
# be bought with accuracy; the VGG loss is ~56% of the step budget,
# PERFORMANCE.md) and K-scaling on TPS pairs (round 1 showed strong
# K-scaling in temporal mode: 6.58 -> 4.03 -> ~2.9 for K=10/20/30; the
# paper's best MAFL numbers are also K=30).
_IND_3X = VARIANTS["ind_3x"]
_CHAMP = _IND_3X + ["loss.input_scale=2"]
VARIANTS.update(
    {
        # drop conv4_3 (the deepest, most expensive tap): 4 loss terms
        "ind_3x_halfvgg_no4": _IND_3X + [
            "loss.input_scale=2",
            "loss.taps=[conv1_2,conv2_2,conv3_3]",
            "loss.weights=[1,1,1,1]",
        ],
        # quarter-resolution VGG pass
        "ind_3x_quartervgg": _IND_3X + ["loss.input_scale=4"],
        "ind_3x_k30_halfvgg": _CHAMP + ["model.n_landmarks=30"],
    }
)

# Convergence runs (separate --out file so the 15k pass records stay):
# - final TPS recipe at 60k with piecewise LR decay (VERDICT item 3
#   done-criterion: TPS-pair synthetic <= ~4% with a curve artifact)
# - K=30 temporal to convergence, completing the K-scaling table against the
#   paper's K=30 ~ 2.5% row (VERDICT item 5); K=20 converged at 2.93% with
#   the same 35k/LR-decay recipe in round 1.
VARIANTS.update(
    {
        "final_ind_3x_halfvgg_60k": _CHAMP + [
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        # the measured-best K=10 recipe at 15k (6.07 %IOD)
        "final_ind_2x_halfvgg_60k": _IND_2X + [
            "loss.input_scale=2",
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        "final_ind_3x_k30_halfvgg_60k": _CHAMP + [
            "model.n_landmarks=30",
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        "temporal_k30_35k": [
            "data.pair_mode=temporal",
            "model.n_landmarks=30",
            "train.lr_boundaries=[20000,30000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
    }
)

# Round-3 A/B (VERDICT r2 #2): the offline-TRAINED feature extractor
# (scripts/train_features.py, SURVEY §7 step 3b) against the random-VGG
# stand-in, on the exact K=10 and K=30 convergence recipes whose random-VGG
# results are 5.90 / 2.24 %IOD at 60k (docs/artifacts/final_runs.jsonl).
_TRAINED = ["loss.feature_source=trained"]
VARIANTS.update(
    {
        "final_ind_2x_trainedfeat_60k": VARIANTS["final_ind_2x_halfvgg_60k"]
        + _TRAINED,
        "final_ind_3x_k30_trainedfeat_60k": VARIANTS[
            "final_ind_3x_k30_halfvgg_60k"
        ]
        + _TRAINED,
        # 15k probes for a fast read before committing 60k steps
        "ind_2x_trainedfeat": _IND_2X + ["loss.input_scale=2"] + _TRAINED,
        "ind_3x_k30_trainedfeat": _CHAMP
        + ["model.n_landmarks=30"]
        + _TRAINED,
        # noise-only denoising trunk (no photometric invariance — the 'both'
        # trunk measured WORSE than random VGG at K=10: 7.21 vs 6.07):
        # train_features.py --corruption noise --out weights/trained_features_noise.npz
        "ind_2x_trainedfeat_noise": _IND_2X
        + ["loss.input_scale=2"]
        + _TRAINED
        + ["loss.trained_weights=weights/trained_features_noise.npz"],
    }
)

# Equivariance EXTENSION probes (train.equi_weight — NOT in the reference;
# documented in train/state.py and COMPONENTS.md). Motivation: the oracle
# controls show the K=10 unsupervised floor (5.90) sits 3.2x above the
# architecture's supervised ceiling (1.87) — the reconstruction objective
# under-constrains landmark placement at K=10.
_K10_BASE = _IND_2X + ["loss.input_scale=2"]
VARIANTS.update(
    {
        "ind_2x_equi03": _K10_BASE + ["train.equi_weight=0.3"],
        "ind_2x_equi1": _K10_BASE + ["train.equi_weight=1.0"],
        "final_ind_2x_equi_60k": _K10_BASE + [
            "train.equi_weight=1.0",
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
    }
)

# Noise-only trained trunk beat random VGG at K=10 (5.12 vs 6.07 at 15k,
# still falling) — convergence runs + the combined trunk+equivariance probe.
_DECAY60 = ["train.lr_boundaries=[35000,50000]", "train.lr_factors=[1.0,0.3,0.1]"]
_NOISE_TRUNK = _TRAINED + [
    "loss.trained_weights=weights/trained_features_noise.npz"
]
VARIANTS.update(
    {
        "final_ind_2x_noisefeat_60k": _K10_BASE + _NOISE_TRUNK + _DECAY60,
        "final_ind_3x_k30_noisefeat_60k": _CHAMP
        + ["model.n_landmarks=30"]
        + _NOISE_TRUNK
        + _DECAY60,
        "ind_2x_noisefeat_equi1": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"],
        "final_ind_2x_noisefeat_equi_60k": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"]
        + _DECAY60,
        # the combined recipe at K=30 — chasing the 2.24 flagship number
        "final_ind_3x_k30_noisefeat_equi_60k": _CHAMP
        + ["model.n_landmarks=30"]
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"]
        + _DECAY60,
    }
)

# Temporal-mode equivariance (warp_view auxiliary view — pairs.py): probe at
# 15k, then a 35k convergence run against the round-2 temporal K=30 2.08.
_TEMPORAL_K30 = [
    "data.pair_mode=temporal",
    "model.n_landmarks=30",
]
VARIANTS.update(
    {
        "temporal_k30_equi1": _TEMPORAL_K30 + ["train.equi_weight=1.0"],
        # equi-weight dose-response on the combined K=10 recipe (1.0 → 4.12
        # @15k; does more/less help? collapse risk: the shared warp component
        # cancels in the equi term, so a coordinate-collapse shortcut is
        # partially rewarded at high weight)
        "ind_2x_noisefeat_equi05": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=0.5"],
        "ind_2x_noisefeat_equi2": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=2.0"],
        # dose-response kept rising at 2.0 (4.12 -> 3.30 @15k going 1->2):
        # probe 4.0 before committing the 60k budget; watch for the
        # coordinate-collapse shortcut the term partially rewards
        "ind_2x_noisefeat_equi4": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=4.0"],
        # same dose question on the K=30 flagship recipe (its 60k equi1 run
        # read 2.27 at step 15k — the comparison point for this probe)
        "ind_3x_k30_noisefeat_equi2": _CHAMP
        + ["model.n_landmarks=30"]
        + _NOISE_TRUNK
        + ["train.equi_weight=2.0"],
        "temporal_k30_noisefeat_equi_35k": _TEMPORAL_K30
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"]
        + [
            "train.lr_boundaries=[20000,30000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        # Stronger (3x) individual warps on the combined K=10 recipe: the
        # K=30 flagship uses the 3x base and converged 1.77; K=10 converged
        # runs so far all use the 2x base (3.48 @60k, plateaued from 51k).
        # At 15k without noise/equi 3x vs 2x was a wash (6.25 vs 6.39), but
        # the equivariance term gets its supervision FROM the warp, so the
        # dose may matter more now.
        "ind_3x_k10_noisefeat_equi1": _IND_3X
        + ["loss.input_scale=2"]
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"],
    }
)

# K=10 convergence attempt at the 3.2 target (the driver's MAFL number is a
# K=10 figure): winner of the {equi05, equi2, ind_3x_k10} probe round at
# 60k with the flagship LR schedule.
VARIANTS.update(
    {
        "final_ind_3x_k10_noisefeat_equi_60k": _IND_3X
        + ["loss.input_scale=2"]
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0"]
        + [
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        # Polyak-averaged params (train.param_ema_decay) on the best-known
        # K=10 recipe at the dose-response winner weight; eval reports raw
        # AND *_ema metrics, so this run A/Bs the EMA lever for free.
        "final_ind_2x_k10_noisefeat_equi2_ema_60k": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=2.0", "train.param_ema_decay=0.999"]
        + [
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        # K=30 flagship + EMA. The dose optimum is K-dependent: the 15k
        # probe read equi2 at 2.84 vs the 60k equi1 run's 2.27 at the same
        # step, so K=30 keeps weight 1.0 (K=10 peaks at 2.0).
        "final_ind_3x_k30_noisefeat_equi1_ema_60k": _CHAMP
        + ["model.n_landmarks=30"]
        + _NOISE_TRUNK
        + ["train.equi_weight=1.0", "train.param_ema_decay=0.999"]
        + [
            "train.lr_boundaries=[35000,50000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
        # Wall-clock-bounded version of the equi2+EMA final (a 60k run is
        # ~70 min on the relay-attached chip; the locked 60k variant above
        # remains the canonical protocol when a full slot is available).
        # Schedule compressed proportionally: 35k/50k -> 24k/34k at 40k.
        "final_ind_2x_k10_noisefeat_equi2_ema_40k": _K10_BASE
        + _NOISE_TRUNK
        + ["train.equi_weight=2.0", "train.param_ema_decay=0.999"]
        + [
            "train.lr_boundaries=[24000,34000]",
            "train.lr_factors=[1.0,0.3,0.1]",
        ],
    }
)


def default_variants() -> list[str]:
    """Variants the bare (no ``--only``) 15k sweep runs: plain probes —
    including temporal-mode ones. Convergence runs (detected by their
    baked-in LR-decay boundaries, which are sized for their own step
    budgets) and trained-feature A/Bs (which require
    ``weights/trained_features*.npz`` to exist) run only via ``--only``."""
    return [
        n for n, ov in VARIANTS.items()
        if not any(o.startswith("train.lr_boundaries") for o in ov)
        and "feat" not in n
    ]


def run_variant(name: str, overrides: list[str], steps: int, out_path: str):
    import jax

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment
    from imm_tpu.utils.config import apply_overrides

    # Long runs wedge occasionally (lost device RPC -> stall watchdog exits
    # 42): give each variant a scratch workdir so Orbax checkpoints every
    # 1000 steps and a shell retry loop resumes instead of restarting.
    # After a resume the recorded curve covers only the final process's
    # steps; `final` is always the converged number. The workdir is keyed
    # on (name, steps, overrides) so an edited variant under the same name
    # never silently resumes a stale checkpoint from the old config.
    import hashlib

    cfg_key = hashlib.sha1(
        f"{steps}|{'|'.join(overrides)}".encode()
    ).hexdigest()[:8]
    config = apply_overrides(
        get_preset("synthetic"),
        [
            f"name={name}",
            "train.batch_size=128",
            f"train.total_steps={steps}",
            "eval_every=3000",
            f"workdir=/tmp/sweep_work/{name}_{cfg_key}",
        ]
        + overrides,
    )
    exp = build_experiment(config, restore=True)
    t0 = time.time()
    state = exp.run()
    final = exp.eval_fn(state)
    curve = [
        {k: v for k, v in h.items() if k == "step" or k.startswith("eval/")}
        for h in exp.trainer.history
        if any(k.startswith("eval/") for k in h)
    ]
    rec = {
        "variant": name,
        "steps": steps,
        "overrides": overrides,
        "final": final,
        "curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[sweep] {name}: test={final['landmark_error_test_pct']:.2f}%IOD "
          f"({rec['wall_s']:.0f}s)", flush=True)
    jax.clear_caches()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=15_000)
    parser.add_argument(
        "--out", default="docs/artifacts/sweep_tps.jsonl",
    )
    parser.add_argument(
        "--only", default=None, help="comma-separated variant subset"
    )
    args = parser.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S")
    from imm_tpu.cli._common import enable_compile_cache

    enable_compile_cache()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["variant"] for line in f if line.strip()}
    names = args.only.split(",") if args.only else default_variants()
    unknown = sorted(set(names) - VARIANTS.keys())
    if unknown:  # fail in milliseconds, not hours into the sweep
        raise SystemExit(f"unknown variants {unknown}; options: {sorted(VARIANTS)}")
    for name in names:
        if name in done:
            print(f"[sweep] {name}: already recorded, skipping", flush=True)
            continue
        run_variant(name, VARIANTS[name], args.steps, args.out)


if __name__ == "__main__":
    main()
