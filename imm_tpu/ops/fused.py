"""Fused landmark bottleneck: heatmaps -> coords -> Gaussian re-render.

The reference computes this as three separate TF ops
(``imm/models/imm_model.py:get_coord`` + ``get_gaussian_maps`` — mount empty at
build time, per SURVEY.md §3.5, the trio is "the fusion target for Pallas").
Here both implementations are provided:

- ``impl='xla'``: the composable jnp ops from ``ops.coords`` / ``ops.gauss``;
  XLA fuses the softmax/expectation/exp chain into neighboring convs.
- ``impl='pallas'``: a single Mosaic kernel that reads each heatmap block from
  VMEM once and writes coords + rendered maps without HBM round-trips, gridded
  over the batch. The backward pass is a second Pallas kernel
  (``_bottleneck_bwd_kernel``) wired through ``custom_vjp``: it recomputes the
  tiny forward intermediates in-register (cheaper than residual round-trips)
  and emits d(heatmaps) in one VMEM pass; gradients match the composable
  implementation (see tests/test_fused.py).

``landmark_bottleneck`` is the public entry; ``impl='auto'`` picks Pallas on
TPU backends and XLA elsewhere (e.g. the CPU test mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imm_tpu.ops.coords import marginal_softmax_coords
from imm_tpu.ops.gauss import render_gaussian_maps


def _bottleneck_reference(heatmaps, out_hw, inv_std, temperature, mode):
    coords = marginal_softmax_coords(heatmaps, temperature)
    maps = render_gaussian_maps(coords, out_hw, inv_std, mode)
    return coords, maps


def _ruler(shape, dim, n, dtype):
    """[-1, 1] linspace along ``dim`` of ``shape`` via integer iota.

    Mosaic has no float iota ('tpu.iota' must be integer), so
    ``jnp.linspace`` cannot lower inside a kernel; build the ruler from an
    int32 ``broadcasted_iota`` and scale.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(dtype)
    return i * (2.0 / (n - 1)) - 1.0


def _bottleneck_kernel(h_ref, coords_ref, maps_ref, *, out_hw, inv_std, temperature):
    """One batch-block: marginal softmax -> expectation -> 'rot' render."""
    x = h_ref[:]  # (BT, H, W, K)
    bt, h, w, k = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    inv_t = 1.0 / temperature

    y_marg = jnp.mean(x, axis=2)  # (BT, H, K)
    x_marg = jnp.mean(x, axis=1)  # (BT, W, K)
    py = jax.nn.softmax(y_marg * inv_t, axis=1)
    px = jax.nn.softmax(x_marg * inv_t, axis=1)
    cy = jnp.sum(py * _ruler((bt, h, k), 1, h, dtype), axis=1)  # (BT, K)
    cx = jnp.sum(px * _ruler((bt, w, k), 1, w, dtype), axis=1)
    coords_ref[:] = jnp.stack([cy, cx], axis=-1)

    g_y = jnp.square(_ruler((bt, k, oh), 2, oh, dtype) - cy[:, :, None])
    g_x = jnp.square(_ruler((bt, k, ow), 2, ow, dtype) - cx[:, :, None])
    dist = (g_y[:, :, :, None] + g_x[:, :, None, :]) * (inv_std**2)
    maps_ref[:] = jnp.transpose(jnp.exp(-dist), (0, 2, 3, 1))


def _bottleneck_pallas_fwd(heatmaps, out_hw, inv_std, temperature, batch_tile):
    b, h, w, k = heatmaps.shape
    oh, ow = out_hw
    bt = min(batch_tile, b)
    # Pad batch to a multiple of the tile; sliced off after the call.
    pad = (-b) % bt
    if pad:
        heatmaps = jnp.concatenate(
            [heatmaps, jnp.zeros((pad, h, w, k), heatmaps.dtype)], axis=0
        )
    bp = heatmaps.shape[0]
    grid = (bp // bt,)
    kernel = functools.partial(
        _bottleneck_kernel, out_hw=out_hw, inv_std=inv_std, temperature=temperature
    )
    coords, maps = pl.pallas_call(
        kernel,
        grid=grid,
        # Interpreter mode off-TPU so the kernel is testable on the CPU mesh.
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((bt, h, w, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((bt, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, oh, ow, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, k, 2), heatmaps.dtype),
            jax.ShapeDtypeStruct((bp, oh, ow, k), heatmaps.dtype),
        ),
    )(heatmaps)
    if pad:
        coords, maps = coords[:b], maps[:b]
    return coords, maps


def _bottleneck_bwd_kernel(
    h_ref, dc_ref, dm_ref, dh_ref, *, out_hw, inv_std, temperature
):
    """One batch-block of the bottleneck VJP, entirely in VMEM.

    Residual = the input heatmaps only; the tiny forward intermediates
    (marginal softmaxes, coords, rendered maps) are recomputed in-register —
    cheaper than a round-trip to HBM for five residual tensors.

    Math (per landmark): with z = marginal/T, p = softmax(z), c = Σ p·r and
    M = exp(-s²((r_y−c_y)² + (r_x−c_x)²)):
      dc += Σ_ij dM·M·2s²(r−c)          (render term)
      dz  = p·(r − c)·dc                 (softmax-expectation jacobian)
      dH  = dz_y/(T·W) ⊕ dz_x/(T·H)      (mean-marginal broadcast)
    """
    x = h_ref[:]  # (BT, H, W, K)
    dc = dc_ref[:]  # (BT, K, 2)
    dm = dm_ref[:]  # (BT, oh, ow, K)
    bt, h, w, k = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    inv_t = 1.0 / temperature
    s2 = inv_std * inv_std

    y_marg = jnp.mean(x, axis=2)  # (BT, H, K)
    x_marg = jnp.mean(x, axis=1)  # (BT, W, K)
    py = jax.nn.softmax(y_marg * inv_t, axis=1)
    px = jax.nn.softmax(x_marg * inv_t, axis=1)
    ry = _ruler((bt, h, k), 1, h, dtype)
    rx = _ruler((bt, w, k), 1, w, dtype)
    cy = jnp.sum(py * ry, axis=1)  # (BT, K)
    cx = jnp.sum(px * rx, axis=1)

    gy = _ruler((bt, k, oh), 2, oh, dtype) - cy[:, :, None]  # (BT, K, oh)
    gx = _ruler((bt, k, ow), 2, ow, dtype) - cx[:, :, None]  # (BT, K, ow)
    maps = jnp.exp(-(jnp.square(gy)[:, :, :, None] + jnp.square(gx)[:, :, None, :]) * s2)
    wgt = jnp.transpose(dm, (0, 3, 1, 2)) * maps * (2.0 * s2)  # (BT, K, oh, ow)
    # gy is constant along ow (and gx along oh), so the 2-D pixel reduction
    # factors into two single-trailing-axis reductions — which is also the
    # only shape Mosaic supports (no multi-trailing-dim vector reductions).
    dcy = dc[:, :, 0] + jnp.sum(jnp.sum(wgt, axis=3) * gy, axis=2)
    dcx = dc[:, :, 1] + jnp.sum(jnp.sum(wgt, axis=2) * gx, axis=2)

    dym = py * (ry - cy[:, None, :]) * (dcy[:, None, :] * inv_t)  # (BT, H, K)
    dxm = px * (rx - cx[:, None, :]) * (dcx[:, None, :] * inv_t)  # (BT, W, K)
    dh_ref[:] = dym[:, :, None, :] * (1.0 / w) + dxm[:, None, :, :] * (1.0 / h)


def _bottleneck_pallas_bwd(heatmaps, dcoords, dmaps, out_hw, inv_std, temperature, batch_tile):
    b, h, w, k = heatmaps.shape
    oh, ow = out_hw
    bt = min(batch_tile, b)
    pad = (-b) % bt
    if pad:
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
        )
        heatmaps, dcoords, dmaps = z(heatmaps), z(dcoords), z(dmaps)
    bp = heatmaps.shape[0]
    kernel = functools.partial(
        _bottleneck_bwd_kernel, out_hw=out_hw, inv_std=inv_std, temperature=temperature
    )
    dh = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((bt, h, w, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, oh, ow, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, w, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, h, w, k), heatmaps.dtype),
    )(heatmaps, dcoords, dmaps)
    return dh[:b] if pad else dh


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _bottleneck_pallas(heatmaps, out_hw, inv_std, temperature, batch_tile):
    return _bottleneck_pallas_fwd(heatmaps, out_hw, inv_std, temperature, batch_tile)


def _pallas_fwd_rule(heatmaps, out_hw, inv_std, temperature, batch_tile):
    out = _bottleneck_pallas_fwd(heatmaps, out_hw, inv_std, temperature, batch_tile)
    return out, heatmaps


def _pallas_bwd_rule(out_hw, inv_std, temperature, batch_tile, heatmaps, cotangents):
    dcoords, dmaps = cotangents
    d_heatmaps = _bottleneck_pallas_bwd(
        heatmaps, dcoords, dmaps, out_hw, inv_std, temperature, batch_tile
    )
    return (d_heatmaps,)


_bottleneck_pallas.defvjp(_pallas_fwd_rule, _pallas_bwd_rule)


def landmark_bottleneck(
    heatmaps: jnp.ndarray,
    out_hw: tuple[int, int],
    inv_std: float,
    temperature: float = 1.0,
    mode: str = "rot",
    impl: str = "auto",
    batch_tile: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmaps ``(B,H,W,K)`` -> (coords ``(B,K,2)``, gauss maps ``(B,*out_hw,K)``).

    ``impl``: ``'xla' | 'pallas' | 'auto'``. The Pallas path supports the
    default ``'rot'`` render mode only; other modes fall back to XLA.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and mode == "rot") else "xla"
    if impl == "pallas":
        if mode != "rot":
            raise ValueError("pallas bottleneck supports mode='rot' only")
        return _bottleneck_pallas(heatmaps, tuple(out_hw), float(inv_std),
                                  float(temperature), int(batch_tile))
    return _bottleneck_reference(heatmaps, tuple(out_hw), inv_std, temperature, mode)
