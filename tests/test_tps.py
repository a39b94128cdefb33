"""Unit tests for TPS + similarity warping (SURVEY.md §4 property tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.ops import (
    TPSParams,
    bilinear_sample,
    normalized_grid,
    sample_tps_params,
    tps_sampler_grid,
    warp_image,
)
from imm_tpu.ops.tps import combine_params


def _zero_params(b, n_grid=4):
    return TPSParams(
        rot=jnp.zeros((b,)),
        log_scale=jnp.zeros((b,)),
        trans=jnp.zeros((b, 2)),
        cp_delta=jnp.zeros((b, n_grid * n_grid, 2)),
    )


def test_identity_when_all_noise_zero():
    """sigma=0 everywhere must produce the identity warp (§4)."""
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    out = warp_image(img, _zero_params(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_identity_grid_matches_normalized_grid():
    grid = tps_sampler_grid(_zero_params(1), (16, 16))
    expected = normalized_grid(16, 16)[None]
    np.testing.assert_allclose(np.asarray(grid), np.asarray(expected), atol=1e-4)


def test_pure_translation_moves_known_point():
    """A translation in the backward grid shifts content the opposite way."""
    img = np.zeros((1, 33, 33, 1), np.float32)
    img[0, 16, 16, 0] = 1.0  # center pixel
    params = _zero_params(1)._replace(trans=jnp.asarray([[0.25, 0.0]]))
    out = np.asarray(warp_image(jnp.asarray(img), params))
    # backward map: out(p) = in(p + t); peak at center of input appears where
    # p + t = 0 -> p = -t -> y = -0.25 -> pixel 12 (of 33, ruler step 1/16)
    peak = np.unravel_index(out[0, :, :, 0].argmax(), (33, 33))
    assert peak == (12, 16)


def test_pure_rotation_is_norm_preserving():
    b = 1
    params = _zero_params(b)._replace(rot=jnp.asarray([np.pi / 2]))
    grid = np.asarray(tps_sampler_grid(params, (17, 17))).reshape(-1, 2)
    base = np.asarray(normalized_grid(17, 17)).reshape(-1, 2)
    np.testing.assert_allclose(
        np.linalg.norm(grid, axis=-1), np.linalg.norm(base, axis=-1), atol=1e-4
    )


def test_tps_interpolates_control_displacements():
    """The dense field must reproduce the control-point deltas exactly at
    the control points (TPS is an interpolating spline)."""
    n_grid = 4
    rng = jax.random.PRNGKey(1)
    delta = jax.random.normal(rng, (1, n_grid * n_grid, 2)) * 0.05
    params = _zero_params(1, n_grid)._replace(cp_delta=delta)
    # Evaluate on a grid whose lattice contains the control points: 4 control
    # rows at ruler positions 0, 10, 21, 31 of a 32-lattice? Use size 31 so
    # linspace(-1,1,31) hits -1, -1/3, 1/3, 1 at indices 0, 10, 20, 30.
    grid = np.asarray(tps_sampler_grid(params, (31, 31), n_grid))
    base = np.asarray(normalized_grid(31, 31))
    disp = grid[0] - base
    idx = [0, 10, 20, 30]
    got = disp[np.ix_(idx, idx)].reshape(-1, 2)
    np.testing.assert_allclose(got, np.asarray(delta[0]), atol=1e-3)


def test_sample_params_shapes_and_scale():
    rng = jax.random.PRNGKey(0)
    p = sample_tps_params(rng, 8, rotsd=5.0, scalesd=0.05, transsd=0.1, warpsd=0.01)
    assert p.rot.shape == (8,)
    assert p.trans.shape == (8, 2)
    assert p.cp_delta.shape == (8, 16, 2)
    # degrees -> radians conversion keeps rotations small
    assert float(jnp.abs(p.rot).max()) < 0.5


def test_combine_params_is_sum():
    rng = jax.random.PRNGKey(0)
    a = sample_tps_params(rng, 2, warpsd=0.01)
    b = sample_tps_params(jax.random.PRNGKey(1), 2, warpsd=0.01)
    c = combine_params(a, b)
    np.testing.assert_allclose(np.asarray(c.cp_delta), np.asarray(a.cp_delta + b.cp_delta))


def test_bilinear_sample_identity_and_interp():
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 8, 8, 2))
    grid = normalized_grid(8, 8)[None]
    np.testing.assert_allclose(
        np.asarray(bilinear_sample(img, grid)), np.asarray(img), atol=1e-5
    )
    # Half-pixel shift averages horizontal neighbors
    shift = grid.at[..., 1].add(2.0 / 7.0 / 2.0)
    out = np.asarray(bilinear_sample(img, shift))
    expected = 0.5 * (np.asarray(img)[:, :, :-1] + np.asarray(img)[:, :, 1:])
    np.testing.assert_allclose(out[:, :, :-1], expected, atol=1e-5)


def test_warp_is_differentiable():
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 16, 16, 3))

    def loss(delta):
        p = _zero_params(2)._replace(cp_delta=delta)
        return jnp.sum(warp_image(img, p) ** 2)

    g = jax.grad(loss)(jnp.full((2, 16, 2), 0.01))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_color_jitter_properties():
    from imm_tpu.ops import color_jitter

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    out = color_jitter(rng, imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # jitter actually changes the image
    assert float(jnp.abs(out - imgs).max()) > 1e-3
    # per-sample randomness: two samples get different transforms
    delta = out - imgs
    assert float(jnp.abs(delta[0].mean() - delta[1].mean())) > 1e-4
    # zero-strength jitter is the identity (up to clipping)
    same = color_jitter(rng, imgs, brightness=0.0, contrast=0.0, channel_gain=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(imgs), atol=1e-6)


def test_transform_points_matches_dense_grid():
    """tps_transform_points evaluated on the output lattice must reproduce
    tps_sampler_grid — they are the same analytic map."""
    from imm_tpu.ops.image import normalized_grid
    from imm_tpu.ops.tps import (
        sample_tps_params,
        tps_sampler_grid,
        tps_transform_points,
    )

    params = sample_tps_params(
        jax.random.PRNGKey(3), 2, rotsd=10.0, scalesd=0.1, transsd=0.1,
        warpsd=0.02,
    )
    h = w = 9
    dense = tps_sampler_grid(params, (h, w))  # (B, H, W, 2)
    pts = normalized_grid(h, w).reshape(1, -1, 2).repeat(2, axis=0)
    via_points = tps_transform_points(params, pts).reshape(2, h, w, 2)
    np.testing.assert_allclose(
        np.asarray(via_points), np.asarray(dense), rtol=1e-4, atol=1e-5
    )


def test_equivariance_extension_trains():
    """equi_weight > 0 adds a finite loss/equi term and still trains, in both
    pair modes (temporal synthesizes its own known warp of the target); TPS
    mode with warping disabled is refused."""
    import dataclasses

    import pytest

    from imm_tpu.data.pairs import PairConfig, PairSynthesizer
    from imm_tpu.losses.perceptual import (
        PerceptualLossConfig,
        ReconstructionLoss,
    )
    from imm_tpu.models.imm import IMMConfig
    from imm_tpu.train.state import TrainConfig, create_train_state
    from imm_tpu.train.steps import make_train_step

    cfg = IMMConfig(
        n_landmarks=5, image_size=32, filters=(8, 8, 16, 16),
        strides=(1, 2, 1, 2), decoder_filters=(16, 8, 8),
    )
    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=4, lr_boundaries=(), lr_factors=(1.0,), equi_weight=1.0
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(PairConfig())
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)
    batch = {"image": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))}
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss/equi" in metrics
    assert np.isfinite(float(metrics["loss/equi"]))
    assert np.isfinite(float(metrics["loss/total"]))

    # Temporal mode: the extension synthesizes its own known warp of the
    # target (warp_view) — trains even with pair warping disabled.
    no_warp = PairSynthesizer(PairConfig(enable_warp=False))
    t_step = make_train_step(
        model, loss_fn, tcfg, no_warp, "temporal", donate=False
    )
    t_batch = {
        "image_a": jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3)),
        "image_b": jax.random.uniform(jax.random.PRNGKey(4), (4, 32, 32, 3)),
    }
    _, t_metrics = t_step(state, t_batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(t_metrics["loss/equi"]))
    assert np.isfinite(float(t_metrics["loss/total"]))

    with pytest.raises(ValueError, match="equi_weight"):
        make_train_step(model, loss_fn, tcfg, no_warp, "tps", donate=False)
