"""Jitted train/eval step builders.

Replaces the reference's tower trainer (SURVEY.md §3.1: per-GPU model builds,
``average_gradients``, a host-side ``sess.run`` loop) with a single pure
``(state, batch, rng) -> (state, metrics)`` function. Data parallelism comes
from sharding annotations on the inputs (see ``imm_tpu.parallel.mesh``) — XLA
partitions the step and all-reduces gradients over ICI automatically.

Two dispatch-amortization paths (the axon-tunneled chip costs ~27 ms per
dispatch, so many optimizer steps ride one jitted call):

- ``make_synthetic_train_step``: the data source itself is an on-device pure
  function of a PRNG key, so a ``lax.scan`` runs N full (generate -> warp ->
  forward -> backward -> update) iterations per call with zero host traffic.
- ``make_train_step`` + ``scan_steps > 1``: host-fed batches arrive stacked
  ``(N, B, ...)`` and the scan walks the leading axis.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp

from imm_tpu.data.pairs import PairSynthesizer
from imm_tpu.losses.perceptual import ReconstructionLoss
from imm_tpu.models.imm import IMM
from imm_tpu.train.state import TrainConfig, TrainState, make_optimizer

Metrics = dict[str, jnp.ndarray]


def _scan_mean(metrics: Metrics) -> Metrics:
    """Average per-step metrics over a scan window.

    With the NaN guard active, skipped steps report their metrics as 0.0
    (see ``_single_step``); a plain mean would bias the window toward zero —
    a spuriously *improving* loss exactly when training is unhealthy. Weight
    by the ok-mask instead, so the window mean is over executed steps only;
    ``nonfinite_step`` itself stays a plain mean (the skipped fraction).
    """
    nf = metrics.get("nonfinite_step")
    if nf is None:
        return jax.tree.map(jnp.mean, metrics)
    ok = 1.0 - nf  # (scan,) 1 where the step executed
    denom = jnp.maximum(jnp.sum(ok), 1.0)
    return {
        k: jnp.mean(v) if k == "nonfinite_step" else jnp.sum(v * ok) / denom
        for k, v in metrics.items()
    }


def landmark_separation_loss(
    coords: jnp.ndarray, margin: float
) -> jnp.ndarray:
    """Hinge repulsion on pairwise landmark distances (pair-mean, scalar).

    ``coords``: (B, K, 2) in [-1, 1] units. Returns
    ``mean_B mean_{i != j} relu(margin - d_ij)^2`` — exactly zero once every
    landmark pair sits >= margin apart, so at healthy separations the term
    (and its gradient) vanishes rather than fighting the reconstruction
    objective. Motivated by the round-4 K=10 error decomposition
    (docs/artifacts/diagnose_final_ind_2x_k10_noisefeat_equi2_ema_60k.md):
    two landmarks had collapsed to 1.1 px apart — dead readout capacity.
    """
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)
    k = coords.shape[1]
    off_diag = 1.0 - jnp.eye(k, dtype=dist.dtype)
    hinge = jnp.square(jnp.maximum(margin - dist, 0.0)) * off_diag
    return jnp.mean(jnp.sum(hinge, axis=(1, 2)) / (k * (k - 1)))


def marginal_entropy_loss(
    heatmaps: jnp.ndarray, temperature: float = 1.0
) -> jnp.ndarray:
    """Normalized entropy of the spatial-softmax marginals (scalar).

    ``heatmaps``: (B, H, W, K) raw pose-encoder activations. Computes the
    Shannon entropy of the SAME y/x marginal distributions the coordinate
    readout uses (``ops.coords.marginal_distributions``, same temperature),
    normalized by log(n) per axis so 1.0 = uniform regardless of bottleneck
    resolution; returns the mean over batch, landmarks, and both axes.
    Motivated by the round-4 K=30 error decomposition (docs/artifacts/
    diagnose_final_ind_3x_k30_noisefeat_equi1_ema_60k.md): ~17/30 landmarks
    sat diffuse (20-35 px marginal std) and near-static — idle readout
    capacity. Penalizing marginal entropy pressures the encoder to commit
    every heatmap to a location.

    The XLA ``marginal_distributions`` here is deliberately the single
    definition of "the marginals" even when ``model.config.bottleneck_impl
    == 'pallas'`` (ADVICE r4): the Pallas kernel recomputes the same
    marginal softmax in-register and is pinned to this definition by
    ``tests/test_fused.py`` (forward AND gradient, atol=1e-5) — if that
    parity ever loosens, tighten the kernel, don't fork the penalty onto
    kernel internals.
    """
    from imm_tpu.ops.coords import marginal_distributions

    py, px = marginal_distributions(heatmaps, temperature)

    def _ent(p, axis_n):
        e = -jnp.sum(p * jnp.log(p + 1e-12), axis=1)  # (B, K) nats
        return e / jnp.log(float(axis_n))

    ent_y = _ent(py, heatmaps.shape[1])
    ent_x = _ent(px, heatmaps.shape[2])
    return jnp.mean(0.5 * (ent_y + ent_x))


def _single_step(
    model: IMM,
    loss_fn: ReconstructionLoss,
    optimizer,
    state: TrainState,
    source: jnp.ndarray,
    target: jnp.ndarray,
    nan_guard: bool = False,
    axis_name: str | None = None,
    equi: tuple | None = None,
    sep: tuple | None = None,
    ent: tuple | None = None,
    ema_decay: float = 0.0,
) -> tuple[TrainState, Metrics]:
    """One optimizer update given an already-synthesized (source, target).

    ``axis_name``: set when running under shard_map — the loss pmeans its
    raw terms (global-batch objective), BatchNorm pmeans its statistics
    (model config must carry the same axis name), and the local gradients
    are pmean'd into the global gradient, so the optimizer update is
    identical on every shard.

    ``equi``: optional ``(view, params_v, params_t, n_grid, weight)`` — the
    opt-in equivariance EXTENSION (TrainConfig.equi_weight): run the pose
    encoder on an auxiliary ``view`` whose analytic warp ``params_v`` is
    known, and penalize disagreement with the main pass's coordinates after
    mapping both into a shared frame. TPS mode: view = source, the shared
    frame is the base image (``params_t`` maps target coords into it).
    Temporal mode: view = a fresh known warp of the target, the shared frame
    IS the target (``params_t=None`` → identity). Color jitter happens after
    warping, so view geometry is exact.

    ``sep``: optional ``(weight, margin)`` — the opt-in landmark-separation
    EXTENSION (TrainConfig.sep_weight): a per-image hinge on pairwise
    distances between the main pass's predicted coordinates,
    ``mean_pairs relu(margin - d_ij)^2``. Zero once every landmark pair is
    >= margin apart (coords in [-1, 1]), so it only acts on collapsed /
    duplicated landmarks (the round-4 diagnosis found two, 1.1 px apart).

    ``ent``: optional ``(weight, temperature)`` — the opt-in heatmap-
    concentration EXTENSION (TrainConfig.ent_weight): normalized entropy of
    the main pass's spatial-softmax marginals (``marginal_entropy_loss``);
    targets the K=30 lazy-landmark failure mode (diffuse near-static
    heatmaps = idle readout capacity).
    """

    def objective(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, mutated = model.apply(
            variables, source, target, train=True, mutable=["batch_stats"]
        )
        total, new_ema, metrics = loss_fn(
            out.recon, target, state.loss_ema, state.step, axis_name
        )
        if equi is not None:
            from imm_tpu.ops.tps import tps_transform_points

            view, params_v, params_t, n_grid, w_equi = equi
            # Extra pose pass on the auxiliary view; its BatchNorm statistics
            # are discarded (the main pass owns the running stats).
            (view_coords, _), _ = model.apply(
                variables, view, train=True,
                method=model.encode_pose, mutable=["batch_stats"],
            )
            base_s = tps_transform_points(params_v, view_coords, n_grid)
            base_t = (
                out.coords if params_t is None
                else tps_transform_points(params_t, out.coords, n_grid)
            )
            equi_loss = jnp.mean(
                jnp.sum(jnp.square(base_s - base_t), axis=-1)
            )
            if axis_name is not None:
                equi_loss = jax.lax.pmean(equi_loss, axis_name)
            total = total + w_equi * equi_loss
            metrics = dict(metrics)
            metrics["loss/equi"] = equi_loss
        if sep is not None:
            w_sep, margin = sep
            sep_loss = landmark_separation_loss(out.coords, margin)
            if axis_name is not None:
                sep_loss = jax.lax.pmean(sep_loss, axis_name)
            total = total + w_sep * sep_loss
            metrics = dict(metrics)
            metrics["loss/sep"] = sep_loss
        if ent is not None:
            w_ent, temp = ent
            ent_loss = marginal_entropy_loss(out.heatmaps, temp)
            if axis_name is not None:
                ent_loss = jax.lax.pmean(ent_loss, axis_name)
            total = total + w_ent * ent_loss
            metrics = dict(metrics)
            metrics["loss/ent"] = ent_loss
        new_stats = mutated.get("batch_stats", state.batch_stats)
        return total, (new_stats, new_ema, metrics)

    (loss, (new_stats, new_ema, metrics)), grads = jax.value_and_grad(
        objective, has_aux=True
    )(state.params)
    if axis_name is not None:
        # The global objective is the pmean of per-shard batch means; with
        # shard_map's pmean transpose each shard's grad comes out as its FULL
        # local-batch gradient (verified empirically on this JAX version), so
        # pmean-ing grads across the data axis yields the global-batch
        # gradient — the ICI all-reduce of the reference's tower trainer.
        grads = jax.lax.pmean(grads, axis_name)
    metrics = dict(metrics)
    grad_sq = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)
    )
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_ema_params = (
        jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params, new_params,
        )
        if ema_decay > 0 else state.ema_params
    )
    if nan_guard:
        # A truly skipped step: gate params AND optimizer state on `ok` —
        # merely zeroing grads would still move params via decayed Adam
        # momentum and poison mu/nu with non-finite values.
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_sq)
        gate = lambda new, old: jax.tree.map(  # noqa: E731
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        new_params = gate(new_params, state.params)
        new_opt_state = gate(new_opt_state, state.opt_state)
        if ema_decay > 0:
            # frozen on a skipped step: params didn't move, so the EMA must
            # not drift toward them either
            new_ema_params = gate(new_ema_params, state.ema_params)
        new_ema = jnp.where(ok, new_ema, state.loss_ema)
        new_stats = gate(new_stats, state.batch_stats)
        # report guarded values so one bad step can't NaN-poison the
        # scan-averaged metrics for the whole dispatch window
        loss = jnp.where(ok, loss, 0.0)
        grad_sq = jnp.where(ok, grad_sq, 0.0)
        metrics = {k: jnp.where(ok, v, 0.0) for k, v in metrics.items()}
        metrics["nonfinite_step"] = 1.0 - ok.astype(jnp.float32)
    metrics["loss/total"] = loss
    metrics["grad_norm"] = grad_sq**0.5
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
        loss_ema=new_ema,
        ema_params=new_ema_params,
    )
    return new_state, metrics


def _check_equi(
    train_config: TrainConfig, pair_synth: PairSynthesizer, pair_mode: str
) -> bool:
    """Validate the opt-in equivariance extension's preconditions."""
    if train_config.equi_weight <= 0:
        return False
    if pair_mode == "tps" and not pair_synth.config.enable_warp:
        raise ValueError(
            "train.equi_weight in TPS pair mode needs warping enabled — "
            "the objective maps predicted coordinates through the analytic "
            "pair warps (temporal mode instead synthesizes its own known "
            "warp of the target, so enable_warp is not required there)"
        )
    if len(train_config.equi_factors) != len(train_config.equi_boundaries) + 1:
        raise ValueError(
            "train.equi_factors must have one more entry than "
            f"train.equi_boundaries, got {train_config.equi_factors} / "
            f"{train_config.equi_boundaries}"
        )
    return True


def _equi_weight_schedule(train_config: TrainConfig):
    """Step -> effective equivariance weight (jit-traceable).

    Piecewise-constant like the LR schedule: ``equi_weight`` scaled by
    ``equi_factors[i]`` between boundaries. Constant when no boundaries."""
    if not train_config.equi_boundaries:
        w = train_config.equi_weight * train_config.equi_factors[0]
        return lambda step: w
    # Direct segment lookup rather than optax's cumulative-ratio form: the
    # ratio form silently ignored a non-unit factors[0] (weight came out
    # scaled by factors[i]/factors[0], 4x off for factors=[0.5,1.0]) and
    # divided by zero on a warm-up-style 0.0 factor.
    boundaries = jnp.asarray(train_config.equi_boundaries)
    factors = jnp.asarray(train_config.equi_factors, dtype=jnp.float32)
    base = train_config.equi_weight

    def schedule(step):
        idx = jnp.sum(step >= boundaries)
        return base * factors[idx]

    return schedule


def make_train_step(
    model: IMM,
    loss_fn: ReconstructionLoss,
    train_config: TrainConfig,
    pair_synth: PairSynthesizer,
    pair_mode: str = "tps",
    scan_steps: int = 1,
    donate: bool = True,
    mesh=None,
) -> Callable[[TrainState, dict[str, Any], jax.Array], tuple[TrainState, Metrics]]:
    """Host-fed step. ``batch`` keys: 'image' (tps) or 'image_a'/'image_b'
    (temporal). With ``scan_steps > 1`` every batch leaf has an extra leading
    scan axis and the returned metrics are scan-averaged.

    ``mesh``: when given (size > 1), the step runs under ``shard_map`` over
    the mesh's 'data' axis — this is what makes the Pallas kernels inside
    partition per-shard instead of being replicated by the SPMD partitioner
    (which cannot see into a pallas_call), and it is the explicit form of
    the reference's tower DP. The model config must then carry
    ``axis_name='data'``.
    """
    optimizer = make_optimizer(train_config)
    axis = "data" if (mesh is not None and mesh.size > 1) else None
    use_equi = _check_equi(train_config, pair_synth, pair_mode)
    equi_w = _equi_weight_schedule(train_config)
    sep = (
        (train_config.sep_weight, train_config.sep_margin)
        if train_config.sep_weight > 0 else None
    )
    ent = (
        (train_config.ent_weight, model.config.temperature)
        if train_config.ent_weight > 0 else None
    )

    def synth(rng, batch):
        if pair_mode == "tps":
            if use_equi:
                s, t, ps, pt = pair_synth.pair_with_params(rng, batch["image"])
                return s, t, (s, ps, pt, pair_synth.config.n_grid)
            return (*pair_synth(rng, batch["image"]), None)
        if pair_mode == "temporal":
            if not use_equi:
                # no split: keeps pre-equi temporal runs seed-reproducible
                return (
                    *pair_synth.temporal_pair(
                        rng, batch["image_a"], batch["image_b"]
                    ),
                    None,
                )
            k_pair, k_view = jax.random.split(rng)
            s, t = pair_synth.temporal_pair(
                k_pair, batch["image_a"], batch["image_b"]
            )
            view, pv = pair_synth.warp_view(k_view, t)
            return s, t, (view, pv, None, pair_synth.config.n_grid)
        raise ValueError(f"unknown pair mode: {pair_mode!r}")

    def one(state, batch, rng):
        source, target, equi = synth(rng, batch)
        if equi is not None:
            # weight scheduled on the live step so lax.scan windows and
            # checkpoint resumes land on the same schedule position
            equi = (*equi, equi_w(state.step))
        return _single_step(
            model, loss_fn, optimizer, state, source, target,
            nan_guard=train_config.skip_nonfinite_updates,
            axis_name=axis,
            equi=equi,
            sep=sep,
            ent=ent,
            ema_decay=train_config.param_ema_decay,
        )

    def core(state, batch, rng):
        if axis is not None:
            # distinct augmentation/data randomness per shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if scan_steps == 1:
            return one(state, batch, rng)
        rngs = jax.random.split(rng, scan_steps)

        def body(carry, xs):
            sub_batch, sub_rng = xs
            return one(carry, sub_batch, sub_rng)

        state, metrics = jax.lax.scan(body, state, (batch, rngs))
        return state, _scan_mean(metrics)

    if axis is None:
        step_fn = core
    else:
        from jax.sharding import PartitionSpec as P

        batch_spec = P(None, "data") if scan_steps > 1 else P("data")
        step_fn = jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(P(), batch_spec, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_synthetic_train_step(
    model: IMM,
    loss_fn: ReconstructionLoss,
    train_config: TrainConfig,
    pair_synth: PairSynthesizer,
    sample_batch: Callable[..., dict[str, jnp.ndarray]],
    pair_mode: str = "tps",
    scan_steps: int = 1,
    donate: bool = True,
    mesh=None,
):
    """Fully on-device step: data generation lives inside the jitted program.

    ``sample_batch(rng)`` must be a pure function returning {'image': ...} or
    {'image_a', 'image_b'}; with ``scan_steps > 1`` the whole
    generate/synthesize/update pipeline scans on device.

    ``mesh`` (size > 1): the step runs under shard_map and ``sample_batch``
    must accept ``(rng, local_batch)`` so each shard generates its slice of
    the global batch from a fold_in'd key — data generation itself scales
    with the slice, zero host bytes, zero cross-chip data movement.
    """
    optimizer = make_optimizer(train_config)
    axis = "data" if (mesh is not None and mesh.size > 1) else None
    use_equi = _check_equi(train_config, pair_synth, pair_mode)
    equi_w = _equi_weight_schedule(train_config)
    sep = (
        (train_config.sep_weight, train_config.sep_margin)
        if train_config.sep_weight > 0 else None
    )
    ent = (
        (train_config.ent_weight, model.config.temperature)
        if train_config.ent_weight > 0 else None
    )
    local_batch = (
        train_config.batch_size // mesh.size if axis else train_config.batch_size
    )

    def one(state, rng):
        k_data, k_pair = jax.random.split(rng)
        batch = (
            sample_batch(k_data, local_batch) if axis else sample_batch(k_data)
        )
        equi = None
        if pair_mode == "tps":
            if use_equi:
                source, target, ps, pt = pair_synth.pair_with_params(
                    k_pair, batch["image"]
                )
                equi = (source, ps, pt, pair_synth.config.n_grid)
            else:
                source, target = pair_synth(k_pair, batch["image"])
        else:
            if use_equi:
                # split only when the extension is on: keeps pre-equi
                # temporal runs seed-reproducible
                k_pair, k_view = jax.random.split(k_pair)
            source, target = pair_synth.temporal_pair(
                k_pair, batch["image_a"], batch["image_b"]
            )
            if use_equi:
                view, pv = pair_synth.warp_view(k_view, target)
                equi = (view, pv, None, pair_synth.config.n_grid)
        if equi is not None:
            equi = (*equi, equi_w(state.step))
        return _single_step(
            model, loss_fn, optimizer, state, source, target,
            nan_guard=train_config.skip_nonfinite_updates,
            axis_name=axis,
            equi=equi,
            sep=sep,
            ent=ent,
            ema_decay=train_config.param_ema_decay,
        )

    def core(state, rng):
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if scan_steps == 1:
            return one(state, rng)
        rngs = jax.random.split(rng, scan_steps)
        state, metrics = jax.lax.scan(lambda c, r: one(c, r), state, rngs)
        return state, _scan_mean(metrics)

    if axis is None:
        step_fn = core
    else:
        from jax.sharding import PartitionSpec as P

        step_fn = jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_coords_fn(model: IMM):
    """Jitted batched pose-encoder sweep: images -> (B, K, 2) coords."""

    def coords_fn(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        coords, _ = model.apply(variables, images, method=model.encode_pose)
        return coords

    return jax.jit(coords_fn)
