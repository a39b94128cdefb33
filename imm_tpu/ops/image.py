"""Batched image ops: bilinear warping, color jitter, coordinate grids.

The reference does per-element warping and jitter inside a TF ``tf.data``
pipeline on host (``imm/datasets/tps_sampler.py`` — mount empty, per SURVEY.md
§3.3). Here these ops are *batched device ops*: the whole deformation-pair
synthesis runs inside the jitted train step so the host pipeline only has to
deliver decoded frames. Gathers and elementwise work stay fused by XLA.

Conventions: images are channel-last ``(B, H, W, C)`` float; sampling grids are
``(B, H, W, 2)`` in ``(y, x)`` order, normalized to [-1, 1] with -1 = first
pixel center and +1 = last pixel center (align_corners=True semantics, matching
TF1-era resampling used by the reference era of code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity sampling grid, shape ``(H, W, 2)`` in (y, x) order, [-1, 1]."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], axis=-1)


def bilinear_sample(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``images`` at ``grid`` locations with bilinear interpolation.

    Args:
      images: ``(B, H, W, C)``.
      grid: ``(B, Ho, Wo, 2)`` in (y, x), [-1, 1], align-corners semantics.
        Out-of-range coordinates clamp to the border (edge padding).

    Returns:
      ``(B, Ho, Wo, C)``.

    TPU notes: implemented as four flat ``take_along_axis`` gathers + a fused
    lerp — one of the few genuinely gather-bound ops in the framework; the
    Pallas warp kernel in ``ops/fused.py`` targets the same semantics.
    """
    b, h, w, c = images.shape
    _, ho, wo, _ = grid.shape
    dtype = images.dtype

    # Coordinate math stays float32 regardless of the image dtype: bf16 has
    # an 8-bit mantissa, i.e. ~0.5-pixel quantization at 128px — enough to
    # visibly corrupt the warp.
    grid = grid.astype(jnp.float32)
    fy = (grid[..., 0] + 1.0) * 0.5 * (h - 1)
    fx = (grid[..., 1] + 1.0) * 0.5 * (w - 1)
    fy = jnp.clip(fy, 0.0, h - 1)
    fx = jnp.clip(fx, 0.0, w - 1)

    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0).astype(dtype)[..., None]
    wx = (fx - x0).astype(dtype)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    # One fused gather for all four bilinear neighbors (measured faster than
    # four separate gathers on TPU: one pass over the index stream).
    flat = images.reshape(b, h * w, c)
    n = ho * wo
    idx = jnp.concatenate(
        [
            (y0 * w + x0).reshape(b, n),
            (y0 * w + x1).reshape(b, n),
            (y1 * w + x0).reshape(b, n),
            (y1 * w + x1).reshape(b, n),
        ],
        axis=1,
    )
    g = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
    v00, v01, v10, v11 = (
        v.reshape(b, ho, wo, c) for v in jnp.split(g, 4, axis=1)
    )

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def color_jitter(
    rng: jax.Array,
    images: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.3,
    channel_gain: float = 0.15,
) -> jnp.ndarray:
    """Per-sample random brightness / contrast / channel-gain jitter.

    The reference jitters the *source* image of each pair so appearance differs
    from the target even for static datasets (SURVEY.md §0 step 1). Batched:
    one fused elementwise pass, per-sample parameters drawn on device.

    Args:
      rng: PRNG key.
      images: ``(B, H, W, C)`` in [0, 1].

    Returns:
      Jittered images, clipped back to [0, 1].
    """
    b, _, _, c = images.shape
    k_b, k_c, k_g = jax.random.split(rng, 3)
    dtype = images.dtype
    bright = jax.random.uniform(
        k_b, (b, 1, 1, 1), dtype, -brightness, brightness
    )
    contr = 1.0 + jax.random.uniform(k_c, (b, 1, 1, 1), dtype, -contrast, contrast)
    gain = 1.0 + jax.random.uniform(
        k_g, (b, 1, 1, c), dtype, -channel_gain, channel_gain
    )
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    out = (images - mean) * contr + mean + bright
    out = out * gain
    return jnp.clip(out, 0.0, 1.0)
