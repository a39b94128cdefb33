"""Space-to-depth reformulation of low-channel stride-1 convolutions.

The model's entry conv (7x7, 3->32 at 128px — SURVEY.md §3.5) runs at
~5 TFLOP/s on this chip (PERFORMANCE.md "chip characterization"): with 3
input channels the MXU's 128-wide contraction lanes are ~98% idle. The
canonical TPU fix (used by MLPerf ResNet) is to re-lay the input as
``(H/b, W/b, b*b*C)`` blocks so the same arithmetic runs as a conv with
``b*b`` times the input channels at ``1/b`` the spatial resolution.

Unlike the usual formulation (which fuses a stride-``b`` downsample), this
module reformulates a **stride-1** conv *exactly*: all ``b*b`` output phases
are produced as channel groups and re-interleaved, so the op computes the
SAME function as ``lax.conv`` with SAME padding on the original layout — the
kernel stays in its canonical ``(kh, kw, cin, cout)`` shape (checkpoints and
reference-parity numerics unchanged), only the schedule differs.

Derivation (per spatial axis, block ``b``, odd kernel ``kh``, SAME pad
``p = kh // 2``): output row ``b*I + py`` reads input rows
``b*I + py + di - p``; writing ``py + di - p = b*a + ry`` with
``ry in [0, b)`` gives a conv over block rows ``a`` with extent
``ext = (kh - 1) // b + 2`` and transformed kernel

    K[a, ·, (ci, ry, ·), (co, py, ·)] = k[b*a + ry + (ext//b... see code)]

zero where the index leaves ``[0, kh)``. The zero-padding inflates FLOPs by
``(b*ext / kh)**2`` (7x7: 2.04x at b=2, 2.94x at b=4) while the contraction
dimension grows ``b*b``-fold — a win only where the direct conv's MXU
efficiency is worse than the inflation factor (the 5-TFLOP/s entry conv
qualifies by ~4x; measure per conv, don't assume).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def s2d_kernel(kernel: jnp.ndarray, block: int) -> jnp.ndarray:
    """Transform a (kh, kw, cin, cout) stride-1 SAME kernel to block space.

    Returns (ext, ext, cin*b*b, cout*b*b) with channel packings
    in: ``ci*b*b + ry*b + rx``; out: ``co*b*b + py*b + px``.
    """
    kh, kw, cin, cout = kernel.shape
    if kh != kw or kh % 2 != 1:
        raise ValueError(f"odd square kernels only, got {kernel.shape}")
    b = block
    p = kh // 2
    ext = (kh - 1) // b + 2  # block-space kernel extent
    pad_lo = (ext // 2) * b  # zero-pad so all gathered indices are valid
    kp = jnp.pad(kernel, ((pad_lo, pad_lo), (pad_lo, pad_lo), (0, 0), (0, 0)))
    a = jnp.arange(ext)[:, None, None]
    r = jnp.arange(b)[None, :, None]
    ph = jnp.arange(b)[None, None, :]
    # di = b*(a - ext//2) + r + p - ph, shifted by pad_lo into kp's index space
    d = b * (a - ext // 2) + r + p - ph + pad_lo  # (ext, b, b)
    full = kp[
        d[:, None, :, None, :, None], d[None, :, None, :, None, :]
    ]  # (ext, ext, b[ry], b[rx], b[py], b[px], cin, cout)
    return full.transpose(0, 1, 6, 2, 3, 7, 4, 5).reshape(
        ext, ext, cin * b * b, cout * b * b
    )


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b), channel packing ci*b*b+ry*b+rx."""
    n, h, w, c = x.shape
    b = block
    x = x.reshape(n, h // b, b, w // b, b, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(n, h // b, w // b, c * b * b)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (packing co*b*b+py*b+px)."""
    n, hh, ww, cbb = x.shape
    b = block
    c = cbb // (b * b)
    x = x.reshape(n, hh, ww, c, b, b)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(n, hh * b, ww * b, c)


def s2d_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, block: int = 2
) -> jnp.ndarray:
    """Exactly ``lax.conv(x, kernel, stride 1, SAME)`` via block relayout.

    Args:
      x: (B, H, W, cin) with H, W divisible by ``block``.
      kernel: (kh, kw, cin, cout), odd square kh.
      block: spatial block size b.

    Returns:
      (B, H, W, cout), bit-comparable (float-reassociation tolerance) to the
      direct conv.
    """
    ext = (kernel.shape[0] - 1) // block + 2
    # block offsets a run over [-ext//2, ext-1-ext//2] (see s2d_kernel)
    pad = ext // 2, ext - 1 - ext // 2
    y = lax.conv_general_dilated(
        space_to_depth(x, block),
        s2d_kernel(kernel, block),
        window_strides=(1, 1),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32
        if x.dtype == jnp.float32
        else None,
    )
    return depth_to_space(y, block)


def reference_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """The direct stride-1 SAME conv (the function s2d_conv reproduces)."""
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
