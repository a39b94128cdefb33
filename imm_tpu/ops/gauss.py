"""Gaussian heatmap re-rendering.

Reference behavior (tomasjakab/imm, ``imm/models/imm_model.py:get_gaussian_maps``
— mount empty at build time, semantics reconstructed per SURVEY.md §2): render K
landmark coordinates back into K fixed-width isotropic maps on an ``(H, W)``
grid in [-1, 1] normalized units. Three modes:

- ``'rot'``  (default): ``exp(-((y-mu_y)^2 + (x-mu_x)^2) * inv_std^2)`` —
  rotationally symmetric Gaussian.
- ``'flat'``: ``exp(-((dist + eps) ** 0.25))`` of the same scaled squared
  distance — a flatter, heavier-tailed bump.
- ``'ankush'``: separable ``exp(-sqrt(eps + |delta| * inv_std))`` profiles per
  axis combined by outer product (a rank-1 map).

TPU notes: the 'rot'/'flat' paths are pure broadcasted elementwise work (VPU);
'ankush' is a batched rank-1 outer product which XLA lowers to the MXU. All
shapes are static. The fused bottleneck kernel in ``imm_tpu.ops.fused``
reproduces the 'rot' mode.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_gaussian_maps(
    mu: jnp.ndarray,
    shape_hw: tuple[int, int],
    inv_std: float,
    mode: str = "rot",
) -> jnp.ndarray:
    """Render landmark coordinates as Gaussian heatmaps.

    Args:
      mu: ``(B, K, 2)`` coordinates ordered ``(y, x)`` in [-1, 1].
      shape_hw: output spatial shape ``(H, W)``.
      inv_std: inverse standard deviation in normalized units.
      mode: ``'rot' | 'flat' | 'ankush'``.

    Returns:
      ``(B, H, W, K)`` maps in (0, 1].
    """
    if mu.ndim != 3 or mu.shape[-1] != 2:
        raise ValueError(f"expected (B, K, 2) coords, got {mu.shape}")
    h, w = shape_hw
    dtype = mu.dtype
    mu_y = mu[:, :, 0]  # (B, K)
    mu_x = mu[:, :, 1]
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)

    if mode in ("rot", "flat"):
        # (B, K, H, 1) and (B, K, 1, W) squared distances, broadcast-added.
        g_y = jnp.square(ys[None, None, :] - mu_y[:, :, None])
        g_x = jnp.square(xs[None, None, :] - mu_x[:, :, None])
        dist = (g_y[:, :, :, None] + g_x[:, :, None, :]) * (inv_std**2)
        if mode == "rot":
            g_yx = jnp.exp(-dist)
        else:
            g_yx = jnp.exp(-jnp.power(dist + 1e-5, 0.25))
    elif mode == "ankush":
        g_y = jnp.exp(-jnp.sqrt(1e-4 + jnp.abs((ys[None, None, :] - mu_y[:, :, None]) * inv_std)))
        g_x = jnp.exp(-jnp.sqrt(1e-4 + jnp.abs((xs[None, None, :] - mu_x[:, :, None]) * inv_std)))
        # rank-1 outer product per (batch, landmark)
        g_yx = g_y[:, :, :, None] * g_x[:, :, None, :]
    else:
        raise ValueError(f"unknown gaussian mode: {mode!r}")

    # (B, K, H, W) -> channel-last (B, H, W, K)
    return jnp.transpose(g_yx, (0, 2, 3, 1))
