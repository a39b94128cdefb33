"""Thin-plate-spline + similarity random warps, batched for TPU.

Reference behavior (tomasjakab/imm, ``imm/datasets/tps_sampler.py:
TPSRandomSampler`` — mount empty at build time, semantics reconstructed per
SURVEY.md §2/§3.3): sample a random similarity transform (rotation, log-scale,
translation) plus TPS control-point displacement noise, build a dense backward
sampling grid, and bilinearly resample the image. Each deformation pair draws a
*shared* component (applied to both source and target) and an *individual*
component per image, so the pair differs by a nontrivial warp; the parameter
names (``rotsd, scalesd, transsd, warpsd``) carry (shared, individual) standard
deviations like the reference's two-element config lists.

TPU-first design: the reference solved/applied TPS per element on host inside
``tf.data``. Here the control grid is fixed, so the TPS system matrix ``L`` and
the dense radial-basis matrix are *static constants* baked at trace time; per-
sample spline weights and dense flow become two batched matmuls (MXU), followed
by one gather-based bilinear resample. The whole pair synthesis thus runs
on-device inside the jitted train step at line rate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.ops.image import bilinear_sample, normalized_grid


class TPSParams(NamedTuple):
    """Per-sample warp parameters (all leading dim B)."""

    rot: jnp.ndarray  # (B,) rotation angle, radians
    log_scale: jnp.ndarray  # (B,) isotropic log-scale
    trans: jnp.ndarray  # (B, 2) translation (y, x) in normalized units
    cp_delta: jnp.ndarray  # (B, n_ctrl, 2) control-point displacements (y, x)


def control_points(n: int) -> np.ndarray:
    """Regular n×n control grid on [-1, 1]^2, shape (n*n, 2), (y, x) order."""
    ys = np.linspace(-1.0, 1.0, n)
    gy, gx = np.meshgrid(ys, ys, indexing="ij")
    return np.stack([gy.ravel(), gx.ravel()], axis=-1)


def _tps_radial(r2: np.ndarray) -> np.ndarray:
    """U(r) = r^2 log(r^2), with U(0) = 0."""
    return np.where(r2 == 0.0, 0.0, r2 * np.log(np.maximum(r2, 1e-12)))


@functools.lru_cache(maxsize=None)
def _tps_static(n_grid: int, out_h: int, out_w: int):
    """Static TPS matrices for an n_grid×n_grid control lattice.

    Returns (L_inv, basis) as float32 numpy arrays:
      L_inv: (n+3, n+3) inverse of the TPS system matrix (n = n_grid**2).
      basis: (out_h*out_w, n+3) dense evaluation matrix [U(dist) | 1 | y | x].

    Computed once in float64 on host at trace time; both are compile-time
    constants of the jitted program.
    """
    cp = control_points(n_grid)  # (n, 2)
    n = cp.shape[0]
    d2 = np.sum((cp[:, None, :] - cp[None, :, :]) ** 2, axis=-1)
    k_mat = _tps_radial(d2)
    p_mat = np.concatenate([np.ones((n, 1)), cp], axis=1)  # (n, 3)
    l_mat = np.zeros((n + 3, n + 3))
    l_mat[:n, :n] = k_mat
    l_mat[:n, n:] = p_mat
    l_mat[n:, :n] = p_mat.T
    # Small regularization for numerical safety of the inverse.
    l_mat[:n, :n] += 1e-6 * np.eye(n)
    l_inv = np.linalg.inv(l_mat)

    ys = np.linspace(-1.0, 1.0, out_h)
    xs = np.linspace(-1.0, 1.0, out_w)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    pts = np.stack([gy.ravel(), gx.ravel()], axis=-1)  # (G, 2)
    d2_dense = np.sum((pts[:, None, :] - cp[None, :, :]) ** 2, axis=-1)
    u_dense = _tps_radial(d2_dense)  # (G, n)
    basis = np.concatenate([u_dense, np.ones((pts.shape[0], 1)), pts], axis=1)
    return l_inv.astype(np.float32), basis.astype(np.float32)


def sample_tps_params(
    rng: jax.Array,
    batch: int,
    rotsd: float = 0.0,
    scalesd: float = 0.0,
    transsd: float = 0.1,
    warpsd: float = 0.01,
    n_grid: int = 4,
    dtype=jnp.float32,
) -> TPSParams:
    """Draw a batch of random warp parameters on device.

    ``rotsd`` is in degrees (matching the reference's config convention),
    ``scalesd`` a log-scale sd, ``transsd`` in normalized [-1,1] units, and
    ``warpsd`` the control-point displacement sd in normalized units.
    """
    k_r, k_s, k_t, k_w = jax.random.split(rng, 4)
    rot = jax.random.normal(k_r, (batch,), dtype) * (rotsd * np.pi / 180.0)
    log_scale = jax.random.normal(k_s, (batch,), dtype) * scalesd
    trans = jax.random.normal(k_t, (batch, 2), dtype) * transsd
    cp_delta = jax.random.normal(k_w, (batch, n_grid * n_grid, 2), dtype) * warpsd
    return TPSParams(rot, log_scale, trans, cp_delta)


def combine_params(shared: TPSParams, individual: TPSParams) -> TPSParams:
    """Compose a shared pair-level warp with a per-image warp (parameter sum).

    Composing in parameter space keeps pair synthesis to a *single* resample
    per image (the reference resampled once per applied sampler).
    """
    return TPSParams(
        rot=shared.rot + individual.rot,
        log_scale=shared.log_scale + individual.log_scale,
        trans=shared.trans + individual.trans,
        cp_delta=shared.cp_delta + individual.cp_delta,
    )


def tps_sampler_grid(
    params: TPSParams, out_hw: tuple[int, int], n_grid: int = 4
) -> jnp.ndarray:
    """Build the dense backward sampling grid for a batch of warps.

    The output-pixel lattice is mapped through (a) the similarity transform and
    (b) the TPS displacement field interpolating the control-point deltas.

    Returns ``(B, H, W, 2)`` in (y, x), [-1, 1] — feed to ``bilinear_sample``.
    """
    h, w = out_hw
    dtype = params.cp_delta.dtype
    l_inv_np, basis_np = _tps_static(n_grid, h, w)
    l_inv = jnp.asarray(l_inv_np, dtype)
    basis = jnp.asarray(basis_np, dtype)
    n = n_grid * n_grid
    b = params.cp_delta.shape[0]

    # Spline weights: pad displacements with the 3 affine-constraint zeros and
    # hit the precomputed inverse. Laid out as plain 2-D matmuls — (G, n+3) @
    # (n+3, B*2) — so XLA lowers straight onto the MXU instead of a batched
    # broadcast-reduce.
    rhs = jnp.concatenate(
        [params.cp_delta, jnp.zeros((b, 3, 2), dtype)], axis=1
    )  # (B, n+3, 2)
    rhs2d = rhs.transpose(1, 0, 2).reshape(n + 3, b * 2)
    weights = l_inv @ rhs2d  # (n+3, B*2)

    # Dense TPS displacement: (G, n+3) @ (n+3, B*2) -> (B, G, 2).
    disp = (basis @ weights).reshape(-1, b, 2).transpose(1, 0, 2)

    # Similarity transform of the identity lattice.
    base = normalized_grid(h, w, dtype).reshape(-1, 2)  # (G, 2)
    cos = jnp.cos(params.rot) * jnp.exp(params.log_scale)
    sin = jnp.sin(params.rot) * jnp.exp(params.log_scale)
    gy = base[None, :, 0]
    gx = base[None, :, 1]
    sim_y = cos[:, None] * gy - sin[:, None] * gx + params.trans[:, None, 0]
    sim_x = sin[:, None] * gy + cos[:, None] * gx + params.trans[:, None, 1]
    grid = jnp.stack([sim_y, sim_x], axis=-1) + disp
    return grid.reshape(b, h, w, 2)


def tps_transform_points(
    params: TPSParams, points: jnp.ndarray, n_grid: int = 4
) -> jnp.ndarray:
    """Evaluate the warp map at arbitrary points: (B, K, 2) -> (B, K, 2).

    The dense sampling grid (``tps_sampler_grid``) IS this map evaluated on
    the output-pixel lattice: warped_image[p] = base_image[T(p)]. Evaluating
    T at *predicted landmark coordinates* instead lets a training objective
    compare landmarks detected on two warps of the same base frame in the
    shared base frame — the equivariance constraint (an opt-in EXTENSION
    beyond the reference: ``train.equi_weight``; the reference has no such
    term). Differentiable in ``points`` and ``params``.
    """
    dtype = params.cp_delta.dtype
    points = points.astype(dtype)
    b = params.cp_delta.shape[0]
    n = n_grid * n_grid
    cp = jnp.asarray(control_points(n_grid), dtype)  # (n, 2)

    # Spline weights exactly as in tps_sampler_grid.
    l_inv_np, _ = _tps_static(n_grid, 2, 2)  # basis unused; L_inv cached
    l_inv = jnp.asarray(l_inv_np, dtype)
    rhs = jnp.concatenate(
        [params.cp_delta, jnp.zeros((b, 3, 2), dtype)], axis=1
    )
    weights = (l_inv @ rhs.transpose(1, 0, 2).reshape(n + 3, b * 2)).reshape(
        n + 3, b, 2
    ).transpose(1, 0, 2)  # (B, n+3, 2)

    # Radial basis at the query points (float32; U(0) = 0).
    d2 = jnp.sum((points[:, :, None, :] - cp[None, None, :, :]) ** 2, axis=-1)
    u = jnp.where(d2 == 0.0, 0.0, d2 * jnp.log(jnp.maximum(d2, 1e-12)))
    ones = jnp.ones(points.shape[:-1] + (1,), dtype)
    basis = jnp.concatenate([u, ones, points], axis=-1)  # (B, K, n+3)
    disp = jnp.einsum("bkn,bnd->bkd", basis, weights)

    cos = (jnp.cos(params.rot) * jnp.exp(params.log_scale))[:, None]
    sin = (jnp.sin(params.rot) * jnp.exp(params.log_scale))[:, None]
    y = points[..., 0]
    x = points[..., 1]
    sim_y = cos * y - sin * x + params.trans[:, None, 0]
    sim_x = sin * y + cos * x + params.trans[:, None, 1]
    return jnp.stack([sim_y, sim_x], axis=-1) + disp


def warp_image(
    images: jnp.ndarray,
    params: TPSParams,
    out_hw: tuple[int, int] | None = None,
    n_grid: int = 4,
    impl: str = "xla",
) -> jnp.ndarray:
    """Apply batched TPS+similarity warps: grid build + one bilinear resample.

    ``impl``: 'xla' (fused-gather ``bilinear_sample``), 'pallas' (the
    matmul-warp kernel in ``ops.warp_pallas``), or 'auto' (pallas on TPU).
    """
    if out_hw is None:
        out_hw = images.shape[1:3]
    # Grid stays float32 (see bilinear_sample: bf16 coords quantize ~0.5px).
    grid = tps_sampler_grid(params, out_hw, n_grid).astype(jnp.float32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from imm_tpu.ops.warp_pallas import warp_bilinear_pallas

        return warp_bilinear_pallas(images, grid)
    return bilinear_sample(images, grid)
