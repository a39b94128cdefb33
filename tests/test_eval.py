"""Landmark-regression protocol tests (SURVEY.md §3.2 / §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.eval import (
    fit_landmark_regressor,
    landmark_error,
    predict_landmarks,
)


def _linear_world(n, k, l, noise, seed=0):
    """GT landmarks are an exact affine function of the predicted coords.

    The true map is drawn from a FIXED rng so different seeds/sizes share the
    same world and only the samples differ (train/test splits).
    """
    w_true = np.random.default_rng(12345).normal(
        size=(2 * k + 1, 2 * l)
    ).astype(np.float32) * 0.3
    rng = np.random.default_rng(seed)
    pred = rng.uniform(-1, 1, size=(n, k, 2)).astype(np.float32)
    feats = np.concatenate([pred.reshape(n, -1), np.ones((n, 1), np.float32)], 1)
    gt = (feats @ w_true).reshape(n, l, 2)
    gt += rng.normal(size=gt.shape).astype(np.float32) * noise
    return jnp.asarray(pred), jnp.asarray(gt)


def test_regressor_recovers_exact_linear_map():
    pred, gt = _linear_world(n=500, k=6, l=5, noise=0.0)
    w = fit_landmark_regressor(pred, gt, ridge=1e-8)
    err = landmark_error(predict_landmarks(w, pred), gt, norm="size")
    assert float(err) < 0.1  # % of image size


def test_regressor_generalizes_under_noise():
    pred, gt = _linear_world(n=1000, k=6, l=5, noise=0.01)
    pred_te, gt_te = _linear_world(n=200, k=6, l=5, noise=0.01, seed=1)
    w = fit_landmark_regressor(pred, gt)
    err = landmark_error(predict_landmarks(w, pred_te), gt_te, norm="size")
    assert float(err) < 2.0


def test_iod_normalization():
    """Doubling the face scale leaves %IOD unchanged."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(-0.5, 0.5, size=(50, 5, 2)).astype(np.float32)
    pred = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.02
    e1 = landmark_error(jnp.asarray(pred), jnp.asarray(gt), norm="iod")
    e2 = landmark_error(jnp.asarray(pred * 2), jnp.asarray(gt * 2), norm="iod")
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-4)


def test_perfect_prediction_zero_error():
    gt = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(10, 5, 2)))
    assert float(landmark_error(gt, gt, norm="iod")) < 1e-5


def test_chance_level_vs_informative():
    """An informative predictor beats a constant (chance) predictor."""
    pred, gt = _linear_world(n=300, k=6, l=5, noise=0.05)
    w = fit_landmark_regressor(pred, gt)
    informative = landmark_error(predict_landmarks(w, pred), gt, norm="size")
    const = jnp.broadcast_to(jnp.mean(gt, axis=0, keepdims=True), gt.shape)
    chance = landmark_error(const, gt, norm="size")
    assert float(informative) < 0.5 * float(chance)


def test_export_roundtrip(tmp_path):
    """Serialized StableHLO landmark detector returns identical coords."""
    from imm_tpu.eval.export import (
        landmark_fn,
        load_landmarker_file,
        save_landmarker,
    )
    from imm_tpu.models import IMMConfig
    from imm_tpu.models.imm import init_model

    cfg = IMMConfig(
        image_size=32, n_landmarks=4, filters=(8, 8, 16, 16),
        strides=(1, 2, 1, 2), decoder_filters=(16, 8, 8),
    )
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    path = str(tmp_path / "landmarker.stablehlo")
    save_landmarker(path, model, params, stats, batch=2, image_size=32)

    served = load_landmarker_file(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    got = served(x)
    want = landmark_fn(model, params, stats)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_export_swap_generator_roundtrip():
    """Serialized StableHLO swap generator matches pose_swap exactly."""
    from imm_tpu.eval.export import export_swap_generator, load_swap_generator
    from imm_tpu.eval.swap import pose_swap
    from imm_tpu.models import IMMConfig
    from imm_tpu.models.imm import init_model

    cfg = IMMConfig(
        image_size=32, n_landmarks=4, filters=(8, 8, 16, 16),
        strides=(1, 2, 1, 2), decoder_filters=(16, 8, 8),
    )
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    blob = export_swap_generator(model, params, stats, batch=2, image_size=32)
    served = load_swap_generator(blob)

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    app = jax.random.uniform(k1, (2, 32, 32, 3))
    pose = jax.random.uniform(k2, (2, 32, 32, 3))
    got = served(app, pose)
    want = pose_swap(model, params, stats, app, pose)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sweep_coords_handles_ragged_tail():
    """Non-divisible eval sizes: padded tail chunk, exact result count."""
    from imm_tpu.eval.regression import sweep_coords

    calls = []

    def fake_coords_fn(params, stats, images):
        calls.append(images.shape)
        return jnp.zeros((images.shape[0], 3, 2))

    images = np.zeros((10, 8, 8, 3), np.float32)
    out = sweep_coords(fake_coords_fn, None, {}, images, batch_size=4)
    assert out.shape == (10, 3, 2)
    # every chunk padded to the same static shape -> one compiled program
    assert set(calls) == {(4, 8, 8, 3)}
