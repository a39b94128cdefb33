"""Visualization utilities.

Reference behavior (SURVEY.md §2 "Viz utilities"): colorize the K landmark
heatmaps with distinct colors (``colorize_landmark_maps``), overlay predicted
landmarks on frames, and assemble image grids for TensorBoard summaries.
Pure numpy/jnp — safe to call from the host loop on device_get'd arrays.
"""

from __future__ import annotations

import numpy as np


def landmark_colors(k: int) -> np.ndarray:
    """K visually-distinct RGB colors in [0, 1] (HSV wheel), shape (K, 3)."""
    hues = np.linspace(0.0, 1.0, k, endpoint=False)
    h6 = hues * 6.0
    x = 1.0 - np.abs(h6 % 2 - 1.0)
    z = np.zeros_like(x)
    o = np.ones_like(x)
    conds = [h6 < 1, h6 < 2, h6 < 3, h6 < 4, h6 < 5, h6 >= 5]
    choices = [
        np.stack([o, x, z], -1), np.stack([x, o, z], -1),
        np.stack([z, o, x], -1), np.stack([z, x, o], -1),
        np.stack([x, z, o], -1), np.stack([o, z, x], -1),
    ]
    rgb = np.select([c[:, None] for c in conds], choices)
    return rgb.astype(np.float32)


def colorize_landmark_maps(maps: np.ndarray) -> np.ndarray:
    """(B, H, W, K) heatmaps -> (B, H, W, 3) color composite (max-blend)."""
    maps = np.asarray(maps, np.float32)
    b, h, w, k = maps.shape
    colors = landmark_colors(k)  # (K, 3)
    colored = maps[..., None] * colors[None, None, None]  # (B,H,W,K,3)
    out = colored.max(axis=3)
    peak = out.max(axis=(1, 2, 3), keepdims=True)
    return out / np.maximum(peak, 1e-6)


def overlay_landmarks(
    images: np.ndarray, coords: np.ndarray, radius: int = 2
) -> np.ndarray:
    """Draw colored dots at (y, x) in [-1, 1] coords onto (B, H, W, 3) images."""
    out = np.array(images, np.float32, copy=True)
    b, h, w, _ = out.shape
    k = coords.shape[1]
    colors = landmark_colors(k)
    ys = np.clip(((coords[..., 0] + 1) * 0.5 * (h - 1)).round().astype(int), 0, h - 1)
    xs = np.clip(((coords[..., 1] + 1) * 0.5 * (w - 1)).round().astype(int), 0, w - 1)
    for bi in range(b):
        for ki in range(k):
            y, x = ys[bi, ki], xs[bi, ki]
            y0, y1 = max(0, y - radius), min(h, y + radius + 1)
            x0, x1 = max(0, x - radius), min(w, x + radius + 1)
            out[bi, y0:y1, x0:x1] = colors[ki]
    return out


def image_grid(images: np.ndarray, n_cols: int = 8) -> np.ndarray:
    """(B, H, W, C) -> one (rows*H, cols*W, C) grid image (zero-padded)."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    n_cols = min(n_cols, b)
    n_rows = -(-b // n_cols)
    pad = n_rows * n_cols - b
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c), images.dtype)])
    return (
        images.reshape(n_rows, n_cols, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_rows * h, n_cols * w, c)
    )


def training_summary_panel(source, target, recon, coords, gauss_maps) -> np.ndarray:
    """The reference's TensorBoard panel: source / target+landmarks / recon /
    colorized gauss maps, one row per sample."""
    import cv2

    b, h, w, _ = np.asarray(source).shape
    tgt_lm = overlay_landmarks(np.asarray(target), np.asarray(coords))
    gm = colorize_landmark_maps(np.asarray(gauss_maps))
    gm_up = np.stack([cv2.resize(g, (w, h), interpolation=cv2.INTER_NEAREST) for g in gm])
    recon = np.clip(np.asarray(recon, np.float32), 0.0, 1.0)
    panel = np.concatenate([np.asarray(source), tgt_lm, recon, gm_up], axis=2)
    return image_grid(panel, n_cols=1)
