"""Deformation-pair synthesis, on device.

Reference behavior (tomasjakab/imm — mount empty at build time, SURVEY.md
§3.3): per element inside ``tf.data``, duplicate the decoded frame, push both
copies through ``TPSRandomSampler`` (a shared warp component plus an
individual component per copy), then color-jitter the source only. Video
datasets (H36M) instead take two temporally separated frames and skip TPS.

Here the whole synthesis is a single jitted batched program: two grid builds
(static-basis matmuls) + two bilinear resamples + one fused jitter pass, all
in HBM/VMEM — the host never touches the pair. ``PairConfig`` carries the
reference's ``(shared, individual)`` two-element parameter convention.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from imm_tpu.ops.image import color_jitter
from imm_tpu.ops.tps import combine_params, sample_tps_params, warp_image


@dataclasses.dataclass(frozen=True, unsafe_hash=True)
class PairConfig:
    """(shared, individual) warp noise levels, reference-style."""

    rotsd: tuple[float, float] = (5.0, 2.5)  # degrees
    scalesd: tuple[float, float] = (0.05, 0.025)  # log-scale sd
    transsd: tuple[float, float] = (0.05, 0.05)  # normalized units
    warpsd: tuple[float, float] = (0.001, 0.01)  # control-point sd
    n_grid: int = 4
    jitter_brightness: float = 0.2
    jitter_contrast: float = 0.3
    jitter_channel: float = 0.15
    enable_warp: bool = True  # False for video (temporal) pairs
    enable_jitter: bool = True
    warp_impl: str = "auto"  # 'xla' | 'pallas' | 'auto' (see ops.tps.warp_image)


class PairSynthesizer:
    """Batched (source, target) pair synthesis. Pure; safe inside jit."""

    def __init__(self, config: PairConfig = PairConfig()):
        self.config = config

    def __call__(
        self, rng: jax.Array, images: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """images ``(B, H, W, C)`` -> (source, target), same shape.

        Static datasets: both outputs are warps of the input frame sharing a
        common component. Video datasets: call ``temporal_pair`` instead.
        """
        source, target, _, _ = self.pair_with_params(rng, images)
        return source, target

    def pair_with_params(self, rng: jax.Array, images: jnp.ndarray):
        """As ``__call__`` but also returns the two composed warp parameter
        sets ``(source_params, target_params)`` (None when warping is off) —
        consumed by the opt-in equivariance objective (``ops.tps.
        tps_transform_points``), which needs the analytic warp maps."""
        c = self.config
        b = images.shape[0]
        k_shared, k_src, k_tgt, k_jit = jax.random.split(rng, 4)
        params_s = params_t = None
        if c.enable_warp:
            # warp parameters/grids stay float32 even for bf16 images —
            # bf16 coordinates quantize to ~0.5px (see ops.image)
            f32 = jnp.float32
            shared = sample_tps_params(
                k_shared, b, c.rotsd[0], c.scalesd[0], c.transsd[0], c.warpsd[0],
                c.n_grid, f32,
            )
            ind_s = sample_tps_params(
                k_src, b, c.rotsd[1], c.scalesd[1], c.transsd[1], c.warpsd[1],
                c.n_grid, f32,
            )
            ind_t = sample_tps_params(
                k_tgt, b, c.rotsd[1], c.scalesd[1], c.transsd[1], c.warpsd[1],
                c.n_grid, f32,
            )
            params_s = combine_params(shared, ind_s)
            params_t = combine_params(shared, ind_t)
            source = warp_image(
                images, params_s, n_grid=c.n_grid, impl=c.warp_impl
            )
            target = warp_image(
                images, params_t, n_grid=c.n_grid, impl=c.warp_impl
            )
        else:
            source, target = images, images
        if c.enable_jitter:
            source = color_jitter(
                k_jit, source, c.jitter_brightness, c.jitter_contrast,
                c.jitter_channel,
            )
        return source, target, params_s, params_t

    def temporal_pair(
        self, rng: jax.Array, frame_a: jnp.ndarray, frame_b: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Video path: two real frames; jitter the source only (no TPS)."""
        c = self.config
        source = frame_a
        if c.enable_jitter:
            source = color_jitter(
                rng, source, c.jitter_brightness, c.jitter_contrast,
                c.jitter_channel,
            )
        return source, frame_b

    def warp_view(self, rng: jax.Array, images: jnp.ndarray):
        """One composed (shared∘individual-level) warp of ``images`` plus its
        analytic parameters — the auxiliary view for the TEMPORAL-mode
        equivariance extension, where the real frame pair has no known
        transform so the known-warp constraint needs a view of its own.
        Samples regardless of ``enable_warp`` (that flag gates *pair*
        synthesis, which temporal mode doesn't use). The view is jittered
        like a source so the constraint can't be satisfied photometrically.
        """
        c = self.config
        k_a, k_b, k_jit = jax.random.split(rng, 3)
        f32 = jnp.float32
        b = images.shape[0]
        p_a = sample_tps_params(
            k_a, b, c.rotsd[0], c.scalesd[0], c.transsd[0], c.warpsd[0],
            c.n_grid, f32,
        )
        p_b = sample_tps_params(
            k_b, b, c.rotsd[1], c.scalesd[1], c.transsd[1], c.warpsd[1],
            c.n_grid, f32,
        )
        params = combine_params(p_a, p_b)
        view = warp_image(images, params, n_grid=c.n_grid, impl=c.warp_impl)
        if c.enable_jitter:
            view = color_jitter(
                k_jit, view, c.jitter_brightness, c.jitter_contrast,
                c.jitter_channel,
            )
        return view, params
