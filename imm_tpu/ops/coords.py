"""Differentiable spatial-softmax landmark coordinates.

Reference behavior (tomasjakab/imm, ``imm/models/imm_model.py:get_coord`` — mount
empty at build time, semantics reconstructed per SURVEY.md §3.5): for each of the
K heatmap channels, reduce-mean over the *other* spatial axis, softmax over the
remaining axis, and take the expectation against a ``linspace(-1, 1, axis_size)``
ruler. Only these 2K scalars of pose information pass the bottleneck.

TPU notes: the op is a pair of small reductions + softmaxes — XLA fuses the whole
thing into the producing conv's epilogue. A fused Pallas version (together with
the Gaussian re-render) lives in ``imm_tpu.ops.fused``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_coords(n: int, dtype) -> jnp.ndarray:
    """The [-1, 1] coordinate ruler used by both the bottleneck and renderer."""
    return jnp.linspace(-1.0, 1.0, n, dtype=dtype)


def marginal_distributions(
    heatmaps: jnp.ndarray, temperature: float = 1.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Marginal softmax distributions over y and x.

    Args:
      heatmaps: ``(B, H, W, K)`` raw (pre-softmax) heatmap activations.
      temperature: softmax temperature; 1.0 matches the reference.

    Returns:
      ``(py, px)`` with shapes ``(B, H, K)`` and ``(B, W, K)``; each sums to 1
      over its spatial axis.
    """
    if heatmaps.ndim != 4:
        raise ValueError(f"expected (B, H, W, K) heatmaps, got {heatmaps.shape}")
    y_marg = jnp.mean(heatmaps, axis=2)  # (B, H, K)
    x_marg = jnp.mean(heatmaps, axis=1)  # (B, W, K)
    inv_t = 1.0 / temperature
    py = jax.nn.softmax(y_marg * inv_t, axis=1)
    px = jax.nn.softmax(x_marg * inv_t, axis=1)
    return py, px


def marginal_softmax_coords(
    heatmaps: jnp.ndarray, temperature: float = 1.0
) -> jnp.ndarray:
    """Expected (y, x) landmark coordinates in [-1, 1].

    Args:
      heatmaps: ``(B, H, W, K)`` raw heatmap activations.
      temperature: softmax temperature.

    Returns:
      ``(B, K, 2)`` coordinates ordered ``(y, x)`` — the reference's
      ``gauss_yx`` tensor.
    """
    py, px = marginal_distributions(heatmaps, temperature)
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    ys = _axis_coords(h, py.dtype)[None, :, None]
    xs = _axis_coords(w, px.dtype)[None, :, None]
    y = jnp.sum(py * ys, axis=1)  # (B, K)
    x = jnp.sum(px * xs, axis=1)  # (B, K)
    return jnp.stack([y, x], axis=-1)
