"""Pallas fused bottleneck vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.ops import landmark_bottleneck


def test_pallas_matches_xla_forward():
    rng = jax.random.PRNGKey(0)
    hm = jax.random.normal(rng, (5, 16, 16, 10))  # odd batch exercises padding
    c_ref, m_ref = landmark_bottleneck(hm, (16, 16), 10.0, impl="xla")
    c_pl, m_pl = landmark_bottleneck(hm, (16, 16), 10.0, impl="pallas", batch_tile=2)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref), atol=1e-5)


def test_pallas_matches_xla_gradient():
    rng = jax.random.PRNGKey(1)
    hm = jax.random.normal(rng, (2, 8, 8, 4))

    def loss(h, impl):
        c, m = landmark_bottleneck(h, (8, 8), 8.0, impl=impl)
        return jnp.sum(c**2) + jnp.sum(jnp.sin(m))

    g_ref = jax.grad(lambda h: loss(h, "xla"))(hm)
    g_pl = jax.grad(lambda h: loss(h, "pallas"))(hm)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-5)


def test_auto_dispatch_off_tpu_is_xla():
    hm = jnp.zeros((1, 8, 8, 2))
    c, m = landmark_bottleneck(hm, (8, 8), 5.0, impl="auto")
    assert c.shape == (1, 2, 2)
    assert m.shape == (1, 8, 8, 2)
