"""Landmark-regression evaluation protocol.

Reference behavior (tomasjakab/imm ``scripts/test.py`` — mount empty at build
time, per SURVEY.md §3.2): freeze the pose encoder, sweep it over the
annotated train split, fit a linear regressor from the K predicted landmark
coordinates to the human-annotated points, then report the mean L2 error on
the test split normalized by inter-ocular distance (faces, %IOD) or image
size (H36M, % of image).

TPU-native: the encoder sweep is a jitted batched forward; the regressor is a
closed-form ridge solve (``jnp.linalg.lstsq`` on the normal equations) — no
sklearn, no host round-trips beyond the final scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _features(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, K, 2) predicted coords -> (N, 2K+1) design matrix with bias."""
    n = coords.shape[0]
    flat = coords.reshape(n, -1)
    return jnp.concatenate([flat, jnp.ones((n, 1), flat.dtype)], axis=1)


def fit_landmark_regressor(
    pred_coords: jnp.ndarray, gt_landmarks: jnp.ndarray, ridge: float = 1e-5
) -> jnp.ndarray:
    """Closed-form ridge regression: predicted coords -> annotated points.

    Args:
      pred_coords: (N, K, 2) unsupervised landmarks from the pose encoder.
      gt_landmarks: (N, L, 2) annotations, both in [-1, 1] (y, x).
      ridge: Tikhonov strength (scale-free, applied to the normal equations).

    Returns:
      W: (2K+1, 2L) weights including bias row.
    """
    x = _features(pred_coords)  # (N, D)
    y = gt_landmarks.reshape(gt_landmarks.shape[0], -1)  # (N, 2L)
    d = x.shape[1]
    xtx = x.T @ x + ridge * x.shape[0] * jnp.eye(d, dtype=x.dtype)
    xty = x.T @ y
    return jnp.linalg.solve(xtx, xty)


def predict_landmarks(w: jnp.ndarray, pred_coords: jnp.ndarray) -> jnp.ndarray:
    """Apply the fitted regressor: (N, K, 2) -> (N, L, 2)."""
    out = _features(pred_coords) @ w
    return out.reshape(pred_coords.shape[0], -1, 2)


def landmark_error(
    predicted: jnp.ndarray,
    gt: jnp.ndarray,
    norm: str = "iod",
    iod_points: tuple[int, int] = (0, 1),
) -> jnp.ndarray:
    """Mean normalized L2 error in percent.

    ``norm='iod'``: divide each face's mean landmark error by its
    inter-ocular distance (``iod_points`` index the two eyes in the GT).
    ``norm='size'``: divide by the image side length (2.0 in normalized
    coordinates) — the Human3.6M convention.
    """
    per_point = jnp.linalg.norm(predicted - gt, axis=-1)  # (N, L)
    per_image = jnp.mean(per_point, axis=-1)  # (N,)
    if norm == "iod":
        denom = jnp.linalg.norm(gt[:, iod_points[0]] - gt[:, iod_points[1]], axis=-1)
    elif norm == "size":
        denom = jnp.full_like(per_image, 2.0)
    else:
        raise ValueError(f"unknown normalization: {norm!r}")
    return 100.0 * jnp.mean(per_image / jnp.maximum(denom, 1e-8))


def sweep_coords(coords_fn, params, batch_stats, images, batch_size: int = 256):
    """Batched pose-encoder sweep over a (possibly ragged) eval array."""
    n = images.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = images[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad > 0:  # keep shapes static so one compiled program serves all
            chunk = np.concatenate(
                [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)], axis=0
            )
        c = coords_fn(params, batch_stats, jnp.asarray(chunk))
        outs.append(np.asarray(c[: batch_size - pad if pad > 0 else batch_size]))
    return np.concatenate(outs, axis=0)


def evaluate_landmarks(
    coords_fn,
    params,
    batch_stats,
    train_split: dict[str, np.ndarray],
    test_split: dict[str, np.ndarray],
    norm: str = "iod",
    iod_points: tuple[int, int] = (0, 1),
    ridge: float = 1e-5,
    batch_size: int = 256,
) -> dict[str, float]:
    """The full protocol: sweep -> fit on train -> error on train and test."""
    pred_train = sweep_coords(
        coords_fn, params, batch_stats, train_split["image"], batch_size
    )
    pred_test = sweep_coords(
        coords_fn, params, batch_stats, test_split["image"], batch_size
    )
    w = fit_landmark_regressor(
        jnp.asarray(pred_train), jnp.asarray(train_split["landmarks"]), ridge
    )
    err_train = landmark_error(
        predict_landmarks(w, jnp.asarray(pred_train)),
        jnp.asarray(train_split["landmarks"]),
        norm,
        iod_points,
    )
    err_test = landmark_error(
        predict_landmarks(w, jnp.asarray(pred_test)),
        jnp.asarray(test_split["landmarks"]),
        norm,
        iod_points,
    )
    return {
        "landmark_error_train_pct": float(err_train),
        "landmark_error_test_pct": float(err_test),
    }
