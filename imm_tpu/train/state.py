"""Train state: parameters, optimizer, BN statistics, loss-balancing EMA.

Replaces the reference's ``tf.train.Saver``-era session state (SURVEY.md §5)
with an explicit immutable pytree — the unit of jit/donation/checkpointing.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from imm_tpu.models.imm import IMM, IMMConfig


@dataclasses.dataclass(frozen=True, unsafe_hash=True)
class TrainConfig:
    """Optimization hyperparameters (the reference's training YAML keys)."""

    batch_size: int = 64
    learning_rate: float = 1e-3
    # Piecewise-constant decay, reference-style: lr * factor after boundary.
    lr_boundaries: tuple[int, ...] = (200_000, 300_000)
    lr_factors: tuple[float, ...] = (1.0, 0.1, 0.01)
    optimizer: str = "adam"  # 'adam' | 'sgd' (sgd mostly for exactness tests)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    grad_clip: float = 0.0  # 0 disables
    weight_decay: float = 0.0
    # NaN guard (SURVEY.md §5 sanitizers): when True, a step whose loss or
    # grads go non-finite applies a zero update instead of poisoning the
    # params; the skipped step is visible as metrics['nonfinite_step']=1.
    skip_nonfinite_updates: bool = False
    total_steps: int = 300_000
    seed: int = 0
    # Dispatch amortization: run this many optimizer steps per jitted call
    # (lax.scan). >1 requires an on-device data source or stacked batches.
    steps_per_call: int = 1
    # EXTENSION (not in the reference — off by default keeps reference
    # behavior): weight of an equivariance term. TPS mode: the pose encoder
    # runs on the source too, both coordinate sets are mapped into the
    # shared base frame through the analytic pair warps
    # (ops.tps.tps_transform_points), and their squared distance is
    # penalized. Temporal mode: the frames share no known transform, so a
    # fresh known warp of the TARGET is synthesized as an auxiliary view
    # (PairSynthesizer.warp_view) and its coordinates are mapped back into
    # the target frame. Directly constrains landmark placement, which the
    # K=10 reconstruction objective alone under-determines (the supervised
    # oracle reaches 1.87 %IOD where unsupervised floors at ~5.9 —
    # docs/artifacts/oracle_floor.md).
    equi_weight: float = 0.0
    # Optional piecewise-constant schedule ON the equivariance weight,
    # lr-style: effective weight = equi_weight * factor, factor switching at
    # each boundary. () keeps the weight constant. Motivation (VERDICT r4
    # #6): the equi term is a surrogate — near convergence the constraint
    # can bind against the reconstruction objective's finer placement, so a
    # decayed schedule (e.g. factors (1.0, 0.3) at the LR decay boundary)
    # tests whether relaxing it late buys accuracy.
    equi_boundaries: tuple[int, ...] = ()
    equi_factors: tuple[float, ...] = (1.0,)
    # EXTENSION (not in the reference — off by default keeps reference
    # behavior): landmark-separation penalty. The round-4 error
    # decomposition of the K=10 flagship (docs/artifacts/
    # diagnose_final_ind_2x_k10_noisefeat_equi2_ema_60k.md) found two
    # landmarks collapsed onto each other (min pairwise distance 1.1 px of
    # 128, diffuse heatmaps, ~half the positional variance of their peers) —
    # dead capacity the ridge readout cannot use. The penalty is a hinge on
    # pairwise coordinate distances per image:
    # mean_pairs relu(margin - d_ij)^2, coords in [-1, 1] units, so it is
    # exactly zero once all landmarks sit >= sep_margin apart and never
    # fights the reconstruction objective at healthy separations.
    sep_weight: float = 0.0
    sep_margin: float = 0.2
    # EXTENSION (not in the reference — off by default keeps reference
    # behavior): heatmap-concentration penalty. The round-4 error
    # decomposition of the K=30 flagship (docs/artifacts/
    # diagnose_final_ind_3x_k30_noisefeat_equi1_ema_60k.md) found ~17/30
    # landmarks with diffuse heatmaps (20-35 px marginal std) that barely
    # move — idle capacity contributing no pose information to the readout.
    # The penalty is the normalized Shannon entropy of the same y/x marginal
    # distributions the spatial softmax reads coordinates from (mean over
    # batch, landmarks, and both axes; normalized by log(n) so the knob is
    # resolution-independent, 1.0 = uniform). Unlike the softmax-temperature
    # knob (which only sharpens the readout), this pressures the pose
    # encoder to CONCENTRATE the heatmaps themselves.
    ent_weight: float = 0.0
    # EXTENSION (not in the reference — off by default keeps reference
    # behavior): Polyak/EMA averaging of the parameters,
    # ``ema = d*ema + (1-d)*params`` after every update. When on, eval
    # reports metrics for BOTH raw and EMA params (``*_ema`` keys) so one
    # run A/Bs the lever. BatchNorm statistics are shared (running stats
    # are already an EMA of activation moments, at their own rate).
    param_ema_decay: float = 0.0


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_ema: jnp.ndarray  # per-term loss scale EMA (losses/perceptual.py)
    # Polyak-averaged params (TrainConfig.param_ema_decay > 0), else None —
    # None is an empty pytree node, so states from runs without the option
    # keep their exact pre-existing (checkpoint-compatible) structure.
    ema_params: Any = None


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    sched = optax.piecewise_constant_schedule(
        config.learning_rate,
        {
            int(b): config.lr_factors[i + 1] / config.lr_factors[i]
            for i, b in enumerate(config.lr_boundaries)
        },
    )
    parts = []
    if config.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clip))
    if config.optimizer == "sgd":
        parts.append(optax.sgd(sched))
    elif config.weight_decay > 0:
        parts.append(
            optax.adamw(
                sched, b1=config.adam_b1, b2=config.adam_b2,
                weight_decay=config.weight_decay,
            )
        )
    else:
        parts.append(optax.adam(sched, b1=config.adam_b1, b2=config.adam_b2))
    return optax.chain(*parts)


def create_train_state(
    rng: jax.Array,
    model_config: IMMConfig,
    train_config: TrainConfig,
    n_loss_terms: int,
) -> tuple[IMM, TrainState]:
    """Initialize model variables + optimizer into a fresh TrainState."""
    model = IMM(model_config)
    s = model_config.image_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    # jit the init: one compiled program instead of hundreds of eager ops
    # (each eager dispatch costs ~30 ms through the axon-tunneled chip).
    # train=False: creates the same params + batch_stats, but keeps BatchNorm
    # off its axis_name pmean path, which would need a bound mesh axis here.
    variables = jax.jit(lambda r: model.init(r, dummy, dummy, train=False))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    optimizer = make_optimizer(train_config)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        loss_ema=jnp.ones((n_loss_terms,), jnp.float32),
        ema_params=(
            jax.tree.map(jnp.copy, params)
            if train_config.param_ema_decay > 0 else None
        ),
    )
    return model, state
