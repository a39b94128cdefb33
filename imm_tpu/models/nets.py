"""Encoder / decoder conv stacks.

Reference behavior (tomasjakab/imm, ``imm/models/imm_model.py`` — mount empty
at build time, architecture per SURVEY.md §3.5): both encoders are 8-layer
conv stacks, filters (32, 32, 64, 64, 128, 128, 256, 256), 7x7 first kernel
then 3x3, stride-2 at each filter-width change (128px -> 16px bottleneck). The
pose encoder adds a 1x1 conv head to K heatmap channels. The decoder mirrors
the encoder with 2x nearest-neighbor upsampling back to image resolution.

TPU-first choices:
- channel-last NHWC convs (XLA:TPU native layout, lowered onto the MXU);
- configurable compute dtype (bfloat16 by default in training) with float32
  parameters — casts happen at module boundaries, XLA fuses them into the
  convs;
- normalization is configurable: ``'batch'`` matches the reference era; under
  pjit data parallelism the batch mean is automatically a *global* mean (XLA
  inserts the cross-device collectives), so no tower-style BN mismatch exists
  by construction. ``'group'`` offers a batch-size-independent option.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """Conv -> norm -> ReLU.

    ``axis_name``: when the step runs under ``shard_map``, BatchNorm must
    pmean its statistics across the data axis explicitly (under plain pjit
    the global batch mean emerges from sharding propagation instead).

    ``s2d_block``: > 0 runs the conv through the exact space-to-depth
    reformulation (``ops/s2dconv.py``) — same function, MXU-friendly
    schedule for low-channel stride-1 convs (the entry conv). The kernel
    parameter keeps its canonical (kh, kw, cin, cout) shape.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    s2d_block: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.s2d_block > 0:
            if self.stride != 1:
                raise ValueError("s2d_block applies to stride-1 convs only")
            from imm_tpu.ops.s2dconv import s2d_conv

            kernel = self.param(
                "s2d_kernel",
                nn.initializers.lecun_normal(),
                (self.kernel, self.kernel, x.shape[-1], self.features),
                jnp.float32,
            )
            x = s2d_conv(
                x.astype(self.dtype), kernel.astype(self.dtype), self.s2d_block
            )
            if self.norm == "none":
                bias = self.param(
                    "s2d_bias", nn.initializers.zeros, (self.features,),
                    jnp.float32,
                )
                x = x + bias.astype(self.dtype)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=self.norm == "none",
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.axis_name,
            )(x)
        elif self.norm == "group":
            x = nn.GroupNorm(
                num_groups=min(8, self.features),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        elif self.norm != "none":
            raise ValueError(f"unknown norm: {self.norm!r}")
        return nn.relu(x)


class EncoderTrunk(nn.Module):
    """Shared conv trunk: image -> bottleneck-resolution feature map."""

    filters: Sequence[int] = (32, 32, 64, 64, 128, 128, 256, 256)
    strides: Sequence[int] = (1, 1, 2, 1, 2, 1, 2, 1)
    first_kernel: int = 7
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    entry_s2d: int = 0  # space-to-depth block for the entry conv (0 = direct)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        if self.entry_s2d > 0 and self.strides[0] != 1:
            raise ValueError(
                "entry_s2d reformulates the stride-1 entry conv; this trunk's "
                f"first stride is {self.strides[0]}"
            )
        for i, (f, s) in enumerate(zip(self.filters, self.strides)):
            k = self.first_kernel if i == 0 else 3
            s2d = self.entry_s2d if i == 0 else 0
            x = ConvBlock(
                f, k, s, self.norm, self.dtype, self.axis_name, s2d
            )(x, train)
        return x


class ContentEncoder(nn.Module):
    """Appearance pathway: source image -> spatial feature map."""

    filters: Sequence[int] = (32, 32, 64, 64, 128, 128, 256, 256)
    strides: Sequence[int] = (1, 1, 2, 1, 2, 1, 2, 1)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    entry_s2d: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        return EncoderTrunk(
            self.filters, self.strides, 7, self.norm, self.dtype,
            self.axis_name, self.entry_s2d, name="trunk",
        )(x, train)


class PoseEncoder(nn.Module):
    """Pose pathway: target image -> K raw heatmaps (pre-bottleneck)."""

    n_landmarks: int = 10
    filters: Sequence[int] = (32, 32, 64, 64, 128, 128, 256, 256)
    strides: Sequence[int] = (1, 1, 2, 1, 2, 1, 2, 1)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None
    entry_s2d: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = EncoderTrunk(
            self.filters, self.strides, 7, self.norm, self.dtype,
            self.axis_name, self.entry_s2d, name="trunk",
        )(x, train)
        # 1x1 heatmap head; raw activations feed the spatial softmax.
        return nn.Conv(
            self.n_landmarks,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="heatmap_head",
        )(x)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling (pure reshape/broadcast — no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Decoder(nn.Module):
    """Generator: concat(content features, gauss maps) -> reconstruction.

    Stages double spatial resolution until image size; two convs per stage
    with halving widths, then a final linear 3-channel conv.
    """

    filters: Sequence[int] = (256, 128, 64, 32)
    out_channels: int = 3
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        for i, f in enumerate(self.filters):
            x = ConvBlock(f, 3, 1, self.norm, self.dtype, self.axis_name)(x, train)
            x = ConvBlock(f, 3, 1, self.norm, self.dtype, self.axis_name)(x, train)
            if i < len(self.filters) - 1:
                x = _upsample2x(x)
        # Linear output head; images live in [0, 1], loss sees raw values.
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="to_rgb",
        )(x)
