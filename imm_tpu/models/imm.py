"""The IMM model shell: encoders + landmark bottleneck + generator.

Reference behavior (tomasjakab/imm, ``imm/models/imm_model.py:IMMModel.build``
— mount empty at build time, per SURVEY.md §3.1/§3.5): the content encoder
reads the *source* image, the pose encoder reads the *target*; heatmaps pass
the spatial-softmax bottleneck and are re-rendered as Gaussian maps at
bottleneck resolution; the decoder reconstructs the target from the
concatenation. Only 2K pose scalars cross the bottleneck.

The forward is a pure function of (params, batch) — jit/grad/shard-friendly.
Pose-swap inference (appearance of A in the pose of B, SURVEY.md §3.4) is the
same apply with mixed inputs; see ``imm_tpu.eval.swap``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from imm_tpu.models.nets import ContentEncoder, Decoder, PoseEncoder
from imm_tpu.ops.fused import landmark_bottleneck


@dataclasses.dataclass(frozen=True, unsafe_hash=True)
class IMMConfig:
    """Architecture hyperparameters (the reference's model YAML keys)."""

    n_landmarks: int = 10
    image_size: int = 128
    filters: tuple[int, ...] = (32, 32, 64, 64, 128, 128, 256, 256)
    strides: tuple[int, ...] = (1, 1, 2, 1, 2, 1, 2, 1)
    decoder_filters: tuple[int, ...] = (256, 128, 64, 32)
    gauss_std: float = 0.1  # sigma of the re-rendered maps, normalized units
    gauss_mode: str = "rot"
    temperature: float = 1.0
    norm: str = "batch"
    compute_dtype: str = "float32"  # 'bfloat16' for TPU training
    bottleneck_impl: str = "auto"  # 'xla' | 'pallas' | 'auto'
    # Space-to-depth block for the encoders' stride-1 entry conv (0 = direct
    # conv). An exact reformulation (ops/s2dconv.py) — same function, MXU-
    # friendly schedule for the ~5 TFLOP/s 7x7 3->32 conv; see PERFORMANCE.md.
    entry_s2d: int = 0
    # Set to the mesh data-axis name (e.g. 'data') when the train step runs
    # under shard_map so BatchNorm pmeans statistics across shards.
    axis_name: str | None = None

    def __post_init__(self):
        h = self.bottleneck_hw[0]
        ups = len(self.decoder_filters) - 1
        if h * (2**ups) != self.image_size:
            raise ValueError(
                f"decoder_filters has {ups} upsamples: {h}px bottleneck -> "
                f"{h * 2**ups}px, but image_size={self.image_size}; need one "
                f"stage per 2x plus a final stage"
            )

    @property
    def bottleneck_hw(self) -> tuple[int, int]:
        down = 1
        for s in self.strides:
            down *= s
        return (self.image_size // down, self.image_size // down)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@flax.struct.dataclass
class IMMOutputs:
    """Everything downstream consumers need (loss, eval, viz)."""

    recon: jnp.ndarray  # (B, H, W, 3) reconstruction of the target
    coords: jnp.ndarray  # (B, K, 2) landmark (y, x) in [-1, 1] — 'gauss_yx'
    heatmaps: jnp.ndarray  # (B, h, w, K) raw pose-encoder heatmaps
    gauss_maps: jnp.ndarray  # (B, h, w, K) re-rendered Gaussian maps
    content: jnp.ndarray  # (B, h, w, C) content features


class IMM(nn.Module):
    """Conditional image generation through a landmark bottleneck."""

    config: IMMConfig = IMMConfig()

    def setup(self):
        c = self.config
        self.content_encoder = ContentEncoder(
            c.filters, c.strides, c.norm, c.dtype, c.axis_name, c.entry_s2d,
            name="content_encoder",
        )
        self.pose_encoder = PoseEncoder(
            c.n_landmarks, c.filters, c.strides, c.norm, c.dtype, c.axis_name,
            c.entry_s2d, name="pose_encoder",
        )
        self.decoder = Decoder(
            c.decoder_filters, 3, c.norm, c.dtype, c.axis_name, name="decoder"
        )

    def _bottleneck(self, heatmaps):
        c = self.config
        # Softmax/expectation in float32 for numerical stability regardless of
        # the compute dtype; tiny tensors, so the upcast is free.
        coords, gauss_maps = landmark_bottleneck(
            heatmaps.astype(jnp.float32),
            c.bottleneck_hw,
            inv_std=1.0 / c.gauss_std,
            temperature=c.temperature,
            mode=c.gauss_mode,
            impl=c.bottleneck_impl,
        )
        return coords, gauss_maps.astype(c.dtype)

    def __call__(self, source, target, train: bool = True) -> IMMOutputs:
        """Full forward: reconstruct ``target`` from content(source) + pose(target)."""
        content = self.content_encoder(source, train)
        heatmaps = self.pose_encoder(target, train)
        coords, gauss_maps = self._bottleneck(heatmaps)
        recon = self.decoder(
            jnp.concatenate([content, gauss_maps], axis=-1), train
        )
        return IMMOutputs(
            recon=recon.astype(jnp.float32),
            coords=coords,
            heatmaps=heatmaps.astype(jnp.float32),
            gauss_maps=gauss_maps.astype(jnp.float32),
            content=content.astype(jnp.float32),
        )

    def encode_pose(self, image, train: bool = False):
        """Landmarks only (the eval path): image -> (coords, heatmaps)."""
        heatmaps = self.pose_encoder(image, train)
        coords, _ = self._bottleneck(heatmaps)
        return coords, heatmaps.astype(jnp.float32)

    def encode_content(self, image, train: bool = False):
        return self.content_encoder(image, train)

    def generate(self, content, coords, train: bool = False):
        """Decode from explicit content features + landmark coords (swap path)."""
        c = self.config
        from imm_tpu.ops.gauss import render_gaussian_maps

        gauss_maps = render_gaussian_maps(
            coords.astype(jnp.float32),
            c.bottleneck_hw,
            inv_std=1.0 / c.gauss_std,
            mode=c.gauss_mode,
        ).astype(c.dtype)
        recon = self.decoder(
            jnp.concatenate([content.astype(c.dtype), gauss_maps], axis=-1), train
        )
        return recon.astype(jnp.float32)


def init_model(rng, config: IMMConfig, batch: int = 1) -> tuple[IMM, Any]:
    """Convenience initializer returning (module, variables)."""
    model = IMM(config)
    x = jnp.zeros((batch, config.image_size, config.image_size, 3), jnp.float32)
    variables = model.init(rng, x, x, train=True)
    return model, variables
