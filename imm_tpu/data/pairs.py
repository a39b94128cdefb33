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

    def _sample_level(self, key: jax.Array, batch: int, level: int):
        """One warp-parameter draw at noise level 0 (shared) or 1
        (individual). Parameters/grids stay float32 even for bf16 images —
        bf16 coordinates quantize to ~0.5px (see ops.image). The single
        sd-indexing + dtype site for every warp draw in this class."""
        c = self.config
        return sample_tps_params(
            key, batch, c.rotsd[level], c.scalesd[level], c.transsd[level],
            c.warpsd[level], c.n_grid, jnp.float32,
        )

    def _warp(self, images: jnp.ndarray, params) -> jnp.ndarray:
        return warp_image(
            images, params, n_grid=self.config.n_grid,
            impl=self.config.warp_impl,
        )

    def _maybe_jitter(self, key: jax.Array, images: jnp.ndarray):
        c = self.config
        if not c.enable_jitter:
            return images
        return color_jitter(
            key, images, c.jitter_brightness, c.jitter_contrast,
            c.jitter_channel,
        )

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
            shared = self._sample_level(k_shared, b, 0)
            params_s = combine_params(shared, self._sample_level(k_src, b, 1))
            params_t = combine_params(shared, self._sample_level(k_tgt, b, 1))
            source = self._warp(images, params_s)
            target = self._warp(images, params_t)
        else:
            source, target = images, images
        source = self._maybe_jitter(k_jit, source)
        return source, target, params_s, params_t

    def temporal_pair(
        self, rng: jax.Array, frame_a: jnp.ndarray, frame_b: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Video path: two real frames; jitter the source only (no TPS)."""
        return self._maybe_jitter(rng, frame_a), frame_b

    def warp_view(self, rng: jax.Array, images: jnp.ndarray):
        """One composed (shared∘individual-level) warp of ``images`` plus its
        analytic parameters — the auxiliary view for the TEMPORAL-mode
        equivariance extension, where the real frame pair has no known
        transform so the known-warp constraint needs a view of its own.
        Samples regardless of ``enable_warp`` (that flag gates *pair*
        synthesis, which temporal mode doesn't use). The view is jittered
        like a source so the constraint can't be satisfied photometrically.
        """
        k_a, k_b, k_jit = jax.random.split(rng, 3)
        b = images.shape[0]
        params = combine_params(
            self._sample_level(k_a, b, 0), self._sample_level(k_b, b, 1)
        )
        view = self._maybe_jitter(k_jit, self._warp(images, params))
        return view, params
