"""The experiment presets — one per driver config (BASELINE.json "configs").

1. celeba_k10   — IMM 10-landmark face model on CelebA, MAFL regression eval
2. aflw_k30     — 30-landmark face model on AFLW (TPS pair augmentation)
3. cats_k20     — cat-heads, 20 landmarks (non-face category)
4. human36m     — body landmarks from video frame pairs (temporal sampling)
5. swap         — landmark-conditioned generation / pose-swap inference
plus 'synthetic' — the offline blob-face harness (train + eval end-to-end
with no files), and tiny CPU variants for smoke tests.
"""

from __future__ import annotations

import dataclasses

from imm_tpu.data.pairs import PairConfig
from imm_tpu.losses.perceptual import PerceptualLossConfig
from imm_tpu.models.imm import IMMConfig
from imm_tpu.train.state import TrainConfig
from imm_tpu.utils.config import DataConfig, ExperimentConfig

_FACE_PAIR = PairConfig(
    rotsd=(5.0, 2.5),
    scalesd=(0.05, 0.025),
    transsd=(0.05, 0.05),
    warpsd=(0.001, 0.01),
)

# Half-resolution VGG pass: quarters the FLOPs of the dominant loss cost
# (PERFORMANCE.md step budget) and measured accuracy-POSITIVE on the
# synthetic harness on two warp bases (docs/artifacts/sweep_tps.md:
# 6.07 vs 6.39 %IOD on ind_2x, 7.08 vs 9.01 on ind_4x). The
# reference-faithful full-resolution pass is `loss.input_scale=1`.
_TPU_LOSS = PerceptualLossConfig(input_scale=2)

# steps_per_call: dispatch amortization over the axon tunnel. 40 measures
# +2.4% over 20 (2621 vs 2561 img/s, bench.py) and the trainer's
# `step % every < steps_per_call` cadence logic needs no divisibility; the
# file-backed presets stay at 20 because a host-fed (scan, B, 128, 128, 3)
# super-batch at 40 is ~1 GB/buffer — the on-device synthetic path
# materializes nothing and takes 40 for free.
_TPU_TRAIN = TrainConfig(
    batch_size=64,
    learning_rate=1e-3,
    lr_boundaries=(150_000, 250_000),
    lr_factors=(1.0, 0.1, 0.01),
    total_steps=300_000,
    steps_per_call=20,
)
_TPU_TRAIN_ONDEVICE = dataclasses.replace(_TPU_TRAIN, steps_per_call=40)

PRESETS: dict[str, ExperimentConfig] = {
    "synthetic": ExperimentConfig(
        name="synthetic",
        model=IMMConfig(n_landmarks=10, image_size=128, compute_dtype="bfloat16"),
        train=dataclasses.replace(_TPU_TRAIN_ONDEVICE, total_steps=2_000),
        pair=_FACE_PAIR,
        loss=_TPU_LOSS,
        data=DataConfig(source="synthetic", pair_mode="tps"),
        eval_every=500,
        stall_timeout_s=900.0,
    ),
    "celeba_k10": ExperimentConfig(
        name="celeba_k10",
        model=IMMConfig(n_landmarks=10, image_size=128, compute_dtype="bfloat16"),
        train=_TPU_TRAIN,
        pair=_FACE_PAIR,
        loss=_TPU_LOSS,
        data=DataConfig(source="celeba", pair_mode="tps", eval_norm="iod"),
        eval_every=10_000,
        stall_timeout_s=900.0,
    ),
    "aflw_k30": ExperimentConfig(
        name="aflw_k30",
        model=IMMConfig(n_landmarks=30, image_size=128, compute_dtype="bfloat16"),
        train=_TPU_TRAIN,
        pair=_FACE_PAIR,
        loss=_TPU_LOSS,
        data=DataConfig(source="aflw", pair_mode="tps", eval_norm="iod"),
        eval_every=10_000,
        stall_timeout_s=900.0,
    ),
    "cats_k20": ExperimentConfig(
        name="cats_k20",
        model=IMMConfig(n_landmarks=20, image_size=128, compute_dtype="bfloat16"),
        train=_TPU_TRAIN,
        pair=dataclasses.replace(_FACE_PAIR, rotsd=(10.0, 5.0)),
        loss=_TPU_LOSS,
        data=DataConfig(source="cats", pair_mode="tps", eval_norm="iod"),
        eval_every=10_000,
        stall_timeout_s=900.0,
    ),
    # Equivariance weight 1.0: the only lever that measured positive in
    # temporal mode (round-4 decomposition, sweep_tps.md: 2.29 vs plain 2.99
    # @15k; converged final_temporal_k30_equi1_60k 2.01 vs 2.08). In temporal
    # mode the extension synthesizes its own known warp of the target as the
    # auxiliary view, so enable_warp=False still holds for the PAIR.
    "human36m": ExperimentConfig(
        name="human36m",
        model=IMMConfig(n_landmarks=16, image_size=128, compute_dtype="bfloat16"),
        train=dataclasses.replace(_TPU_TRAIN, equi_weight=1.0),
        pair=PairConfig(enable_warp=False),  # temporal pairs, jitter only
        loss=_TPU_LOSS,
        data=DataConfig(source="human36m", pair_mode="temporal", eval_norm="size"),
        eval_every=10_000,
        stall_timeout_s=900.0,
    ),
    # Config 5 is inference-only: any trained face model serves; kept as a
    # preset so `generate.py --preset swap` has sensible defaults.
    "swap": ExperimentConfig(
        name="swap",
        model=IMMConfig(n_landmarks=10, image_size=128, compute_dtype="bfloat16"),
        train=_TPU_TRAIN,
        pair=_FACE_PAIR,
        loss=_TPU_LOSS,
        data=DataConfig(source="celeba", pair_mode="tps"),
    ),
    # Best-known OFFLINE recipe on the synthetic harness (round-3/4 sweeps,
    # docs/artifacts/sweep_tps.md): ind_2x warps + half-res VGG + the
    # noise-corruption TRAINED feature trunk + the equivariance extension at
    # the K=10 dose-response winner weight 2.0 (4.35/4.12/3.30/3.99 @15k for
    # 0.5/1/2/4). Converged result: 3.42 %IOD at 60k for K=10
    # (final_ind_2x_k10_noisefeat_equi2_ema_60k; equi1 read 3.48, round-2
    # recipe 5.90 — docs/artifacts/final_runs.md).
    # Round 5 adds ent_weight=0.03 — a STRUCTURE lever, not a metric lever:
    # within-sigma on %IOD at matched seed (3.35 vs 3.42, 2-seed family mean
    # 3.57±0.31) but it eliminates the collapsed pair (min pairwise landmark
    # distance 6.0 px vs 1.1) and idle channels (readout rank 20/20), i.e.
    # strictly healthier landmarks for downstream use at no accuracy cost
    # (final_runs.md round 5; diagnose_..._ent003_ema_60k.md;
    # panel_k10_ent003.png).
    # Requires weights/trained_features_noise.npz (scripts/train_features.py
    # --corruption noise); errors with a pointer if absent.
    "synthetic_best": ExperimentConfig(
        name="synthetic_best",
        model=IMMConfig(n_landmarks=10, image_size=128, compute_dtype="bfloat16"),
        train=dataclasses.replace(
            _TPU_TRAIN_ONDEVICE,
            batch_size=128,
            total_steps=60_000,
            lr_boundaries=(35_000, 50_000),
            lr_factors=(1.0, 0.3, 0.1),
            equi_weight=2.0,
            ent_weight=0.03,
        ),
        pair=dataclasses.replace(
            _FACE_PAIR,
            rotsd=(5.0, 5.0),
            scalesd=(0.05, 0.05),
            transsd=(0.05, 0.1),
            warpsd=(0.001, 0.02),
        ),
        loss=dataclasses.replace(
            _TPU_LOSS,
            feature_source="trained",
            trained_weights="weights/trained_features_noise.npz",
        ),
        data=DataConfig(source="synthetic", pair_mode="tps"),
        eval_every=3000,
        stall_timeout_s=900.0,
    ),
    # CPU-smoke variant: "single-batch CPU train+eval" (driver config 1 note)
    "tiny_cpu": ExperimentConfig(
        name="tiny_cpu",
        model=IMMConfig(
            n_landmarks=5,
            image_size=32,
            filters=(8, 8, 16, 16),
            strides=(1, 2, 1, 2),
            decoder_filters=(16, 8, 8),
        ),
        train=TrainConfig(
            batch_size=8, total_steps=50, lr_boundaries=(), lr_factors=(1.0,),
            steps_per_call=1,
        ),
        pair=_FACE_PAIR,
        loss=PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1)),
        data=DataConfig(source="synthetic"),
        eval_every=0,
        eval_samples=64,
    ),
}

# K=30 variant of the best-known offline recipe: ind_3x warps (the K=30
# sweep winner) + the same noise trunk + equivariance AT WEIGHT 1.0 — the
# equi dose optimum is K-dependent (K=30 @15k: 2.27 at weight 1 vs 2.84 at
# weight 2, sweep_tps.md), so this preset overrides the K=10 parent's 2.0.
# Converged to 1.77 %IOD at 60k (final_ind_3x_k30_noisefeat_equi_60k — the
# best number this harness has produced; the EMA re-run read 1.98,
# calibrating run-to-run sigma ~0.1-0.2; non-equi 2.03, round-2 flagship
# 2.24, supervised K=30 oracle ceiling 1.37).
PRESETS["synthetic_best_k30"] = dataclasses.replace(
    PRESETS["synthetic_best"],
    name="synthetic_best_k30",
    model=dataclasses.replace(
        PRESETS["synthetic_best"].model, n_landmarks=30
    ),
    # equi dose 1.0 is the K=30 winner, and the K=10 entropy penalty must
    # NOT carry over: at K=30 the 0.03 dose probed strongly negative
    # (2.97 @15k vs 2.27 base — docs/artifacts/sweep_tps.md round-5 K=30
    # ent section; the dose-response inverts with K).
    train=dataclasses.replace(
        PRESETS["synthetic_best"].train, equi_weight=1.0, ent_weight=0.0
    ),
    pair=dataclasses.replace(
        _FACE_PAIR,
        rotsd=(5.0, 7.5),
        scalesd=(0.05, 0.075),
        transsd=(0.05, 0.12),
        warpsd=(0.001, 0.03),
    ),
)


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; options: {sorted(PRESETS)}")
    return PRESETS[name]
