"""Pallas warp kernel forward AND backward vs the XLA gather reference.

Runs in interpret mode on CPU (conftest forces the cpu backend); the Mosaic
lowering itself is verified on the real chip by the build-session drives.
"""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.ops.image import bilinear_sample, normalized_grid
from imm_tpu.ops.warp_pallas import warp_bilinear_pallas


def _random_case(seed=0, b=2, h=16, w=16, c=3, scale=0.15):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(size=(b, h, w, c)).astype(np.float32))
    grid = normalized_grid(h, w)[None] + jnp.asarray(
        rng.normal(size=(b, h, w, 2)).astype(np.float32) * scale
    )
    return images, grid


def test_forward_matches_xla():
    images, grid = _random_case()
    ref = bilinear_sample(images, grid)
    out = warp_bilinear_pallas(images, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backward_matches_xla():
    """The round-3 Pallas backward (matmul-transpose d_images + derivative-
    mask d_grid) must agree with the XLA gather VJP on both cotangents,
    including out-of-range grid points (clip-chain zeros)."""
    images, grid = _random_case(seed=3, scale=0.4)  # some points off-image

    def loss_pl(images, grid):
        return jnp.sum(jnp.sin(warp_bilinear_pallas(images, grid) * 3.0))

    def loss_ref(images, grid):
        return jnp.sum(jnp.sin(bilinear_sample(images, grid) * 3.0))

    gi_pl, gg_pl = jax.grad(loss_pl, argnums=(0, 1))(images, grid)
    gi_ref, gg_ref = jax.grad(loss_ref, argnums=(0, 1))(images, grid)
    np.testing.assert_allclose(
        np.asarray(gi_pl), np.asarray(gi_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gg_pl), np.asarray(gg_ref), rtol=1e-4, atol=1e-4
    )


def test_forward_out_of_range_coords():
    """Border clamping must match the gather path exactly (restored after the
    round-3 rewrite dropped it)."""
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 16, 16, 3)).astype(np.float32)
    )
    grid = normalized_grid(16, 16)[None] + jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 16, 16, 2)).astype(np.float32)
        * 0.8  # far outside [-1, 1]
    )
    ref = bilinear_sample(images, grid)
    out = warp_bilinear_pallas(images, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_image_impl_switch():
    """warp_image's impl dispatch routes to the same function (restored)."""
    from imm_tpu.ops.tps import TPSParams, warp_image

    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32)
    )
    params = TPSParams(
        rot=jnp.asarray([0.1, -0.1]),
        log_scale=jnp.zeros((2,)),
        trans=jnp.zeros((2, 2)),
        cp_delta=jnp.full((2, 16, 2), 0.01),
    )
    a = warp_image(images, params, impl="xla")
    b = warp_image(images, params, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_backward_exact_border_tie():
    """Identity grids put coords EXACTLY on the clip boundary (grid == -1 on
    the first row/col). lax max/min split a tied gradient 0.5 each way; the
    first backward implementation passed the full gradient there (exactly 2x
    on border pixels). Regression for the code-review finding."""
    images, _ = _random_case(seed=9)
    grid = jnp.broadcast_to(normalized_grid(16, 16)[None], (2, 16, 16, 2))

    gg_pl = jax.grad(lambda g: jnp.sum(warp_bilinear_pallas(images, g) ** 2))(
        grid
    )
    gg_ref = jax.grad(lambda g: jnp.sum(bilinear_sample(images, g) ** 2))(grid)
    np.testing.assert_allclose(
        np.asarray(gg_pl), np.asarray(gg_ref), rtol=1e-4, atol=1e-5
    )


def test_bwd_rule_ab_against_xla_rule():
    """Direct A/B of the two backward rules on identical residuals and
    cotangent — the check _bwd_rule_xla exists for."""
    from imm_tpu.ops.warp_pallas import _bwd_rule, _bwd_rule_xla

    images, grid = _random_case(seed=11, scale=0.3)
    cot = jnp.asarray(
        np.random.default_rng(12).normal(size=(2, 16, 16, 3)).astype(np.float32)
    )
    gi_pl, gg_pl = _bwd_rule((images, grid), cot)
    gi_xl, gg_xl = _bwd_rule_xla((images, grid), cot)
    np.testing.assert_allclose(
        np.asarray(gi_pl), np.asarray(gi_xl), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gg_pl), np.asarray(gg_xl), rtol=1e-4, atol=1e-4
    )


def test_backward_nonsquare_output_grid():
    """Q = Ho*Wo != H*W exercises the chunking path in the backward too."""
    images, _ = _random_case(seed=5, h=16, w=16)
    grid = normalized_grid(8, 12)[None].repeat(2, axis=0)
    grid = grid + 0.05

    gi_pl, gg_pl = jax.grad(
        lambda i, g: jnp.sum(warp_bilinear_pallas(i, g) ** 2), argnums=(0, 1)
    )(images, grid)
    gi_ref, gg_ref = jax.grad(
        lambda i, g: jnp.sum(bilinear_sample(i, g) ** 2), argnums=(0, 1)
    )(images, grid)
    np.testing.assert_allclose(
        np.asarray(gi_pl), np.asarray(gi_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gg_pl), np.asarray(gg_ref), rtol=1e-4, atol=1e-4
    )
