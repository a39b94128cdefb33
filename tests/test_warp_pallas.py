"""Pallas matmul-warp kernel vs the XLA gather path (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.ops.image import bilinear_sample, normalized_grid
from imm_tpu.ops.tps import TPSParams, warp_image
from imm_tpu.ops.warp_pallas import warp_bilinear_pallas


def _random_grid(rng, b, s, scale=0.05):
    base = normalized_grid(s, s)[None]
    noise = scale * jax.random.normal(rng, (b, s, s, 2))
    return jnp.broadcast_to(base, (b, s, s, 2)) + noise


def test_matches_xla_forward():
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (3, 32, 32, 3))
    grid = _random_grid(jax.random.PRNGKey(1), 3, 32)
    ref = bilinear_sample(imgs, grid)
    out = warp_bilinear_pallas(imgs, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_with_out_of_range_coords():
    """Border clamping must match the gather path exactly."""
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    grid = _random_grid(jax.random.PRNGKey(1), 1, 16, scale=0.8)  # far outside
    ref = bilinear_sample(imgs, grid)
    out = warp_bilinear_pallas(imgs, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    grid = _random_grid(jax.random.PRNGKey(1), 2, 16)

    def loss(f, im, g):
        return jnp.sum(jnp.sin(f(im, g)))

    gi_p, gg_p = jax.grad(lambda im, g: loss(warp_bilinear_pallas, im, g), (0, 1))(imgs, grid)
    gi_x, gg_x = jax.grad(lambda im, g: loss(bilinear_sample, im, g), (0, 1))(imgs, grid)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x), atol=1e-4)


def test_warp_image_impl_switch():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = TPSParams(
        rot=jnp.asarray([0.1, -0.1]),
        log_scale=jnp.zeros((2,)),
        trans=jnp.zeros((2, 2)),
        cp_delta=jnp.full((2, 16, 2), 0.01),
    )
    a = warp_image(imgs, params, impl="xla")
    b = warp_image(imgs, params, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
