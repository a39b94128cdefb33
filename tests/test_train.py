"""End-to-end training dynamics on the synthetic harness (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.data import PairConfig, PairSynthesizer, SyntheticBlobFaces
from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
from imm_tpu.models import IMMConfig
from imm_tpu.train import TrainConfig, create_train_state
from imm_tpu.train.steps import make_synthetic_train_step, make_train_step

from tests.common import TINY  # noqa: E402


def _setup(loss_source="pixel", steps_per_call=1, batch=8):
    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source=loss_source, weights=(1.0, 1.0, 1.0))
    )
    tcfg = TrainConfig(batch_size=batch, learning_rate=1e-3, lr_boundaries=(), lr_factors=(1.0,))
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    faces = SyntheticBlobFaces(image_size=32)
    pair = PairSynthesizer(PairConfig())
    step = make_synthetic_train_step(
        model, loss_fn, tcfg, pair,
        lambda rng: faces.sample(rng, batch),
        scan_steps=steps_per_call,
        donate=False,
    )
    return step, state


def test_loss_decreases():
    step, state = _setup()
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(40):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, k)
        losses.append(float(metrics["loss/total"]))
    first = np.mean(losses[1:6])  # skip step 0 (EMA seeding)
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 40


def test_scanned_steps_equivalent_speedup_path():
    """scan_steps=4 advances the state 4 steps per call with finite loss."""
    step, state = _setup(steps_per_call=4)
    state, metrics = step(state, jax.random.PRNGKey(0))
    assert int(state.step) == 4
    assert np.isfinite(float(metrics["loss/total"]))


def test_host_fed_train_step_tps_and_temporal():
    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(batch_size=4, lr_boundaries=(), lr_factors=(1.0,))
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(PairConfig())
    imgs = np.random.default_rng(0).uniform(size=(4, 32, 32, 3)).astype(np.float32)

    step_tps = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)
    state2, m = step_tps(state, {"image": jnp.asarray(imgs)}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss/total"]))

    step_tmp = make_train_step(model, loss_fn, tcfg, pair, "temporal", donate=False)
    _, m = step_tmp(
        state,
        {"image_a": jnp.asarray(imgs), "image_b": jnp.asarray(imgs[::-1])},
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m["loss/total"]))


def test_synthetic_faces_properties():
    faces = SyntheticBlobFaces(image_size=32)
    batch = faces.sample(jax.random.PRNGKey(0), 4)
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["landmarks"].shape == (4, 5, 2)
    assert float(batch["image"].min()) >= 0.0
    assert float(batch["image"].max()) <= 1.0
    pair = faces.sample_pair(jax.random.PRNGKey(1), 2)
    assert pair["image_a"].shape == (2, 32, 32, 3)
    # same identity, different pose -> images differ
    assert float(jnp.abs(pair["image_a"] - pair["image_b"]).max()) > 0.05
    iod = SyntheticBlobFaces.interocular(batch["landmarks"])
    assert bool(jnp.all(iod > 0.1))


def test_nan_guard_skips_bad_update():
    """A poisoned batch must not corrupt params when the guard is on."""
    import dataclasses
    from imm_tpu.data import PairConfig, PairSynthesizer
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
    from imm_tpu.train import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=2, lr_boundaries=(), lr_factors=(1.0,),
        skip_nonfinite_updates=True,
    )
    model, state = create_train_state(jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms)
    pair = PairSynthesizer(dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False))
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)

    bad = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    new_state, metrics = step(state, {"image": bad}, jax.random.PRNGKey(1))
    assert float(metrics["nonfinite_step"]) == 1.0
    # params unchanged (Adam with zero grads still has zero update)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert bool(jnp.all(jnp.isfinite(jax.tree.leaves(new_state.params)[0])))


def test_nan_guard_protects_ema_and_batch_stats():
    import dataclasses
    from imm_tpu.data import PairConfig, PairSynthesizer
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
    from imm_tpu.train import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=2, lr_boundaries=(), lr_factors=(1.0,),
        skip_nonfinite_updates=True,
    )
    model, state = create_train_state(jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms)
    pair = PairSynthesizer(dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False))
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)

    bad = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    s1, _ = step(state, {"image": bad}, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(s1.loss_ema)))
    for leaf in jax.tree.leaves(s1.batch_stats):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # and a good batch afterwards trains normally
    good = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
    s2, m = step(s1, {"image": good}, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss/total"]))


def test_nan_guard_freezes_params_even_with_live_momentum():
    """ADVICE r1: zeroed grads still move params via decayed Adam momentum.
    After a good step (momentum nonzero), a bad step must leave params and
    optimizer state EXACTLY unchanged, and scan-averaged metrics finite."""
    import dataclasses
    from imm_tpu.data import PairConfig, PairSynthesizer
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
    from imm_tpu.train import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=2, lr_boundaries=(), lr_factors=(1.0,),
        skip_nonfinite_updates=True,
    )
    model, state = create_train_state(jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms)
    pair = PairSynthesizer(dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False))
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)

    good = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
    bad = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    s1, _ = step(state, {"image": good}, jax.random.PRNGKey(1))  # momentum now nonzero
    s2, m2 = step(s1, {"image": bad}, jax.random.PRNGKey(2))
    assert float(m2["nonfinite_step"]) == 1.0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1.opt_state), jax.tree.leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # guarded metrics: the bad step reports 0, not NaN (protects scan means)
    assert np.isfinite(float(m2["loss/total"]))
    assert np.isfinite(float(m2["grad_norm"]))

    # scan window with one poisoned sub-batch: averaged metrics stay finite
    step_scan = make_train_step(
        model, loss_fn, tcfg, pair, "tps", scan_steps=2, donate=False
    )
    batch = {"image": jnp.stack([good, bad])}
    s3, m3 = step_scan(s1, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m3["loss/total"]))
    assert np.isfinite(float(m3["grad_norm"]))
    assert float(m3["nonfinite_step"]) == 0.5
    assert bool(jnp.all(jnp.isfinite(jax.tree.leaves(s3.params)[0])))


def test_loss_zero_for_exact_reconstruction():
    """Identical recon/target -> every raw loss term is ~0 (SURVEY.md §4)."""
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss

    for source in ("pixel", "random_vgg"):
        weights = (1, 1, 1) if source == "pixel" else (1, 1, 1, 1, 1)
        loss_fn = ReconstructionLoss(
            PerceptualLossConfig(feature_source=source, weights=weights)
        )
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        total, _, metrics = loss_fn(x, x, loss_fn.init_ema(), 1)
        assert float(total) < 1e-6
        for v in metrics.values():
            assert float(v) < 1e-6

def test_loss_input_scale_halves_vgg_resolution():
    """input_scale pools before the VGG pass; loss stays a valid metric."""
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="random_vgg", input_scale=2)
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (2, 32, 32, 3))
    y = jax.random.uniform(k2, (2, 32, 32, 3))
    # exact reconstruction -> ~0; different images -> clearly positive
    total0, _, _ = loss_fn(x, x, loss_fn.init_ema(), 1)
    total1, _, _ = loss_fn(x, y, loss_fn.init_ema(), 1)
    assert float(total0) < 1e-6
    assert float(total1) > 1e-3
    # non-power-of-two rejected; pixel source has no VGG pass to scale
    import pytest

    with pytest.raises(ValueError):
        ReconstructionLoss(
            PerceptualLossConfig(feature_source="random_vgg", input_scale=3)
        )
    with pytest.raises(ValueError):
        ReconstructionLoss(
            PerceptualLossConfig(feature_source="pixel", input_scale=2)
        )


def test_param_ema_matches_recurrence_and_default_off():
    """param_ema_decay: EMA follows e = d*e + (1-d)*p exactly; off -> None."""
    import dataclasses
    from imm_tpu.data import PairConfig, PairSynthesizer
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
    from imm_tpu.train import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    d = 0.8
    tcfg = TrainConfig(
        batch_size=2, lr_boundaries=(), lr_factors=(1.0,), param_ema_decay=d
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(
        dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False)
    )
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)

    # EMA initializes to the params
    for e, p in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    x = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
    expect = jax.tree.map(np.asarray, state.params)
    for i in range(3):
        state, _ = step(state, {"image": x}, jax.random.PRNGKey(i))
        expect = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p), expect, state.params
        )
    for e, want in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), want, rtol=1e-6, atol=1e-7)
    # EMA lags the raw params after updates
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(
            jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params)
        )
    ]
    assert max(diffs) > 0

    # default config: no EMA pytree at all (checkpoint-compatible structure)
    tcfg_off = TrainConfig(batch_size=2, lr_boundaries=(), lr_factors=(1.0,))
    model2, state2 = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg_off, loss_fn.n_terms
    )
    assert state2.ema_params is None
    step2 = make_train_step(model2, loss_fn, tcfg_off, pair, "tps", donate=False)
    s, _ = step2(state2, {"image": x}, jax.random.PRNGKey(0))
    assert s.ema_params is None


def test_nan_guard_freezes_param_ema():
    """A skipped step must leave the Polyak average untouched too."""
    import dataclasses
    from imm_tpu.data import PairConfig, PairSynthesizer
    from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
    from imm_tpu.train import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=2, lr_boundaries=(), lr_factors=(1.0,),
        skip_nonfinite_updates=True, param_ema_decay=0.9,
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(
        dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False)
    )
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)

    good = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
    bad = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    s1, _ = step(state, {"image": good}, jax.random.PRNGKey(1))
    s2, m2 = step(s1, {"image": bad}, jax.random.PRNGKey(2))
    assert float(m2["nonfinite_step"]) == 1.0
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pair_pose_gap_correlates_frame_poses():
    """pair_pose_gap > 0 draws frame B's pose near frame A's; 0 keeps the
    independent draw (the pre-round-4 behavior, same key usage)."""
    key = jax.random.PRNGKey(7)
    free = SyntheticBlobFaces(image_size=32)
    near = SyntheticBlobFaces(image_size=32, pair_pose_gap=0.15)
    p_free = free.sample_pair(key, 64)
    p_near = near.sample_pair(key, 64)
    # frame A is drawn before the gap branches: identical across modes
    np.testing.assert_array_equal(
        np.asarray(p_free["image_a"]), np.asarray(p_near["image_a"])
    )
    d = lambda p: float(  # noqa: E731
        jnp.linalg.norm(
            p["landmarks_a"] - p["landmarks_b"], axis=-1
        ).mean()
    )
    assert d(p_near) < 0.5 * d(p_free), (
        f"gap=0.15 pairs should move far less than independent poses: "
        f"{d(p_near):.3f} vs {d(p_free):.3f}"
    )
    # still a *pair*: B is not just A
    assert d(p_near) > 1e-3
    # exact endpoint: g=1 IS the independent draw, bitwise (interpolation
    # construction — the fresh draw consumes the key exactly like gap<=0)
    p_one = SyntheticBlobFaces(image_size=32, pair_pose_gap=1.0).sample_pair(
        key, 64
    )
    np.testing.assert_array_equal(
        np.asarray(p_free["landmarks_b"]), np.asarray(p_one["landmarks_b"])
    )
    # delta scales ~linearly with g across components (the additive form
    # under-scaled translation by sqrt(2) relative to rot/scale)
    p_half = SyntheticBlobFaces(image_size=32, pair_pose_gap=0.5).sample_pair(
        key, 256
    )
    p_ind = SyntheticBlobFaces(image_size=32).sample_pair(key, 256)
    c_half = np.asarray(
        (p_half["landmarks_b"] - p_half["landmarks_a"]).mean(axis=1)
    ).std()
    c_ind = np.asarray(
        (p_ind["landmarks_b"] - p_ind["landmarks_a"]).mean(axis=1)
    ).std()
    np.testing.assert_allclose(c_half, 0.5 * c_ind, rtol=0.15)


def test_equi_weight_schedule():
    """Piecewise equi-weight schedule: values, validation, and bitwise
    equivalence of an all-ones schedule with the constant weight."""
    import dataclasses

    import pytest

    from imm_tpu.train.steps import _equi_weight_schedule

    tcfg = TrainConfig(
        batch_size=4, lr_boundaries=(), lr_factors=(1.0,), equi_weight=2.0,
        equi_boundaries=(10, 20), equi_factors=(1.0, 0.5, 0.1),
    )
    sched = _equi_weight_schedule(tcfg)
    assert float(sched(0)) == 2.0
    assert float(sched(9)) == 2.0
    assert float(sched(15)) == pytest.approx(1.0)
    assert float(sched(25)) == pytest.approx(0.2)

    # constant when no boundaries
    const = _equi_weight_schedule(dataclasses.replace(
        tcfg, equi_boundaries=(), equi_factors=(1.0,)
    ))
    assert float(const(0)) == float(const(10**6)) == 2.0

    # factors length must be len(boundaries)+1 (checked at step-build time)
    faces = SyntheticBlobFaces(image_size=32)
    pair = PairSynthesizer(PairConfig())
    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    bad = dataclasses.replace(tcfg, equi_factors=(1.0,))
    model, _ = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    with pytest.raises(ValueError, match="equi_factors"):
        make_synthetic_train_step(
            model, loss_fn, bad, pair, lambda rng: faces.sample(rng, 4),
            donate=False,
        )

    # an all-ones schedule is bitwise the constant-weight step
    def run(cfg):
        model, state = create_train_state(
            jax.random.PRNGKey(0), TINY, cfg, loss_fn.n_terms
        )
        step = make_synthetic_train_step(
            model, loss_fn, cfg, pair,
            lambda rng: faces.sample(rng, 4), donate=False,
        )
        state, metrics = step(state, jax.random.PRNGKey(3))
        state, metrics = step(state, jax.random.PRNGKey(4))
        return state, metrics

    base_cfg = dataclasses.replace(
        tcfg, equi_boundaries=(), equi_factors=(1.0,)
    )
    ones_cfg = dataclasses.replace(
        tcfg, equi_boundaries=(1,), equi_factors=(1.0, 1.0)
    )
    s_base, m_base = run(base_cfg)
    s_ones, m_ones = run(ones_cfg)
    assert float(m_base["loss/total"]) == float(m_ones["loss/total"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_base.params, s_ones.params,
    )


def test_landmark_separation_loss_math():
    """Zero at/above margin; positive and repulsive below it."""
    from imm_tpu.train.steps import landmark_separation_loss

    margin = 0.2
    # all pairs farther than the margin -> exactly zero
    spread = jnp.array([[[-0.8, -0.8], [0.8, 0.8], [-0.8, 0.8]]])
    assert float(landmark_separation_loss(spread, margin)) == 0.0
    # one collapsed pair -> hinge^2 ~ margin^2 on 2 of K(K-1)=6 ordered pairs
    collapsed = jnp.array([[[0.0, 0.0], [0.0, 0.0], [0.8, 0.8]]])
    val = float(landmark_separation_loss(collapsed, margin))
    np.testing.assert_allclose(val, 2 * margin**2 / 6, rtol=1e-4)
    # gradient pushes the collapsed pair APART (and is finite at d ~ 0)
    g = jax.grad(
        lambda c: landmark_separation_loss(c, margin)
    )(collapsed + jnp.array([[[1e-3, 0.0], [-1e-3, 0.0], [0.0, 0.0]]]))
    g = np.asarray(g)[0]
    assert np.isfinite(g).all()
    assert g[0, 0] < 0 and g[1, 0] > 0  # descent moves them apart
    np.testing.assert_allclose(g[2], 0.0, atol=1e-7)  # far landmark untouched


def test_sep_penalty_in_train_step():
    """sep_weight > 0 reports loss/sep and matches the off-path otherwise."""
    import dataclasses

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1.0, 1.0, 1.0))
    )
    tcfg_on = TrainConfig(
        batch_size=4, lr_boundaries=(), lr_factors=(1.0,),
        sep_weight=1.0, sep_margin=0.3,
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg_on, loss_fn.n_terms
    )
    pair = PairSynthesizer(
        dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False)
    )
    x = jnp.linspace(0, 1, 4 * 32 * 32 * 3, dtype=jnp.float32).reshape(4, 32, 32, 3)
    step_on = make_train_step(model, loss_fn, tcfg_on, pair, "tps", donate=False)
    s_on, m_on = step_on(state, {"image": x}, jax.random.PRNGKey(1))
    assert "loss/sep" in m_on and np.isfinite(float(m_on["loss/sep"]))

    tcfg_off = dataclasses.replace(tcfg_on, sep_weight=0.0)
    step_off = make_train_step(model, loss_fn, tcfg_off, pair, "tps", donate=False)
    _, m_off = step_off(state, {"image": x}, jax.random.PRNGKey(1))
    assert "loss/sep" not in m_off
    # the penalty actually entered the objective
    np.testing.assert_allclose(
        float(m_on["loss/total"]),
        float(m_off["loss/total"]) + float(m_on["loss/sep"]),
        rtol=1e-5,
    )


def test_marginal_entropy_loss_math():
    """0 for a delta marginal, 1 for uniform; sharper maps score lower."""
    from imm_tpu.train.steps import marginal_entropy_loss

    h, w = 16, 16
    # one-hot heatmap (huge logit at one pixel) -> marginals are deltas
    delta = jnp.full((1, h, w, 1), -1e4, jnp.float32)
    delta = delta.at[0, 5, 7, 0].set(1e4)
    assert float(marginal_entropy_loss(delta)) < 1e-3
    # constant heatmap -> uniform marginals -> normalized entropy 1
    flat = jnp.zeros((1, h, w, 1), jnp.float32)
    np.testing.assert_allclose(float(marginal_entropy_loss(flat)), 1.0, rtol=1e-5)
    # a concentrated Gaussian bump scores lower than a diffuse one
    yy, xx = jnp.mgrid[0:h, 0:w]
    def bump(std):
        logit = -((yy - 8.0) ** 2 + (xx - 8.0) ** 2) / (2 * std**2)
        return logit[None, :, :, None].astype(jnp.float32) * 40.0
    sharp = float(marginal_entropy_loss(bump(1.0)))
    diffuse = float(marginal_entropy_loss(bump(6.0)))
    assert sharp < diffuse
    # gradient is finite and points toward concentration
    g = jax.grad(marginal_entropy_loss)(bump(6.0))
    assert np.isfinite(np.asarray(g)).all()


def test_ent_penalty_in_train_step():
    """ent_weight > 0 reports loss/ent and matches the off-path otherwise."""
    import dataclasses

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1.0, 1.0, 1.0))
    )
    tcfg_on = TrainConfig(
        batch_size=4, lr_boundaries=(), lr_factors=(1.0,), ent_weight=0.5,
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg_on, loss_fn.n_terms
    )
    pair = PairSynthesizer(
        dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False)
    )
    x = jnp.linspace(0, 1, 4 * 32 * 32 * 3, dtype=jnp.float32).reshape(4, 32, 32, 3)
    step_on = make_train_step(model, loss_fn, tcfg_on, pair, "tps", donate=False)
    s_on, m_on = step_on(state, {"image": x}, jax.random.PRNGKey(1))
    ent = float(m_on["loss/ent"])
    assert np.isfinite(ent) and 0.0 <= ent <= 1.0

    tcfg_off = dataclasses.replace(tcfg_on, ent_weight=0.0)
    step_off = make_train_step(model, loss_fn, tcfg_off, pair, "tps", donate=False)
    _, m_off = step_off(state, {"image": x}, jax.random.PRNGKey(1))
    assert "loss/ent" not in m_off
    # the penalty actually entered the objective (weight 0.5)
    np.testing.assert_allclose(
        float(m_on["loss/total"]),
        float(m_off["loss/total"]) + 0.5 * ent,
        rtol=1e-5,
    )
