"""Unit tests for the spatial-softmax landmark bottleneck (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tpu.ops import marginal_softmax_coords, render_gaussian_maps


def _delta_heatmaps(b, h, w, k, positions, peak=500.0):
    """Heatmaps with a single hot pixel per channel at integer positions."""
    hm = np.zeros((b, h, w, k), np.float32)
    for bi in range(b):
        for ki in range(k):
            y, x = positions[bi][ki]
            hm[bi, y, x, ki] = peak
    return jnp.asarray(hm)


def test_delta_peak_recovers_position():
    h = w = 16
    positions = [[(3, 12), (8, 8), (15, 0)]]
    hm = _delta_heatmaps(1, h, w, 3, positions)
    coords = marginal_softmax_coords(hm)
    assert coords.shape == (1, 3, 2)
    ruler = np.linspace(-1.0, 1.0, h)
    for ki, (y, x) in enumerate(positions[0]):
        np.testing.assert_allclose(coords[0, ki, 0], ruler[y], atol=2e-2)
        np.testing.assert_allclose(coords[0, ki, 1], ruler[x], atol=2e-2)


def test_uniform_heatmap_gives_center():
    hm = jnp.zeros((2, 16, 16, 4))
    coords = marginal_softmax_coords(hm)
    np.testing.assert_allclose(coords, 0.0, atol=1e-6)


def test_coords_in_range_and_differentiable():
    rng = jax.random.PRNGKey(0)
    hm = jax.random.normal(rng, (4, 16, 16, 10))
    coords = marginal_softmax_coords(hm)
    assert jnp.all(jnp.abs(coords) <= 1.0)

    def loss(h):
        return jnp.sum(marginal_softmax_coords(h) ** 2)

    g = jax.grad(loss)(hm)
    assert g.shape == hm.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_temperature_sharpens():
    """Lower temperature moves the expectation toward the argmax."""
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 2, 2, 0] = 3.0  # a weak peak: T=1 expectation is pulled to center
    hm = jnp.asarray(hm)
    soft = marginal_softmax_coords(hm, temperature=1.0)
    sharp = marginal_softmax_coords(hm, temperature=0.05)
    ruler = np.linspace(-1.0, 1.0, 16)
    assert abs(float(sharp[0, 0, 0]) - ruler[2]) < abs(float(soft[0, 0, 0]) - ruler[2])


@pytest.mark.parametrize("mode", ["rot", "flat", "ankush"])
def test_render_roundtrip(mode):
    """Render coords -> soft-argmax of log-maps recovers the coords (§4)."""
    mu = jnp.asarray([[[0.25, -0.5], [-0.75, 0.1], [0.0, 0.9]]], jnp.float32)
    maps = render_gaussian_maps(mu, (64, 64), inv_std=10.0, mode=mode)
    assert maps.shape == (1, 64, 64, 3)
    assert float(maps.max()) <= 1.0 + 1e-6
    # peaked positive maps: use them directly as (unnormalized) logits scaled up
    rec = marginal_softmax_coords(maps * 100.0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(mu), atol=2e-2)


def test_render_gradients_flow_to_coords():
    mu = jnp.asarray([[[0.2, 0.3]]], jnp.float32)

    def loss(m):
        return jnp.sum(render_gaussian_maps(m, (16, 16), 10.0))

    g = jax.grad(loss)(mu)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bottleneck_warp_equivariance():
    """Equivariance (SURVEY.md §4): translating the heatmap content moves the
    soft-argmax coordinates by exactly the translation, and re-rendered
    Gaussian maps follow. Connects warp -> bottleneck -> render."""
    from imm_tpu.ops import warp_image
    from imm_tpu.ops.tps import TPSParams

    # a sharp Gaussian "heatmap image" whose channel peaks at (0.2, -0.4)
    mu = jnp.asarray([[[0.2, -0.4]]], jnp.float32)
    maps = render_gaussian_maps(mu, (64, 64), inv_std=8.0)  # (1, 64, 64, 1)

    shift = jnp.asarray([[-0.25, 0.125]], jnp.float32)  # backward-grid offset
    params = TPSParams(
        rot=jnp.zeros((1,)),
        log_scale=jnp.zeros((1,)),
        trans=shift,
        cp_delta=jnp.zeros((1, 16, 2)),
    )
    warped = warp_image(maps, params)
    # backward map out(p) = in(p + t): content moves by -t
    got = marginal_softmax_coords(warped * 100.0)
    expected = mu[0, 0] - shift[0]
    np.testing.assert_allclose(np.asarray(got[0, 0]), np.asarray(expected), atol=2e-2)
