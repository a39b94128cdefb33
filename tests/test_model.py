"""Model forward / swap-path shape and sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.models import IMM, IMMConfig
from imm_tpu.models.imm import init_model

from tests.common import TINY  # noqa: E402


def test_forward_shapes():
    model, variables = init_model(jax.random.PRNGKey(0), TINY, batch=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out, _ = model.apply(variables, x, x, train=True, mutable=["batch_stats"])
    assert out.recon.shape == (2, 32, 32, 3)
    assert out.coords.shape == (2, 4, 2)
    assert out.heatmaps.shape == (2, 8, 8, 4)
    assert out.gauss_maps.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.abs(out.coords) <= 1.0))


def test_eval_mode_no_mutation():
    model, variables = init_model(jax.random.PRNGKey(0), TINY, batch=1)
    x = jnp.zeros((1, 32, 32, 3))
    out = model.apply(variables, x, x, train=False)
    assert out.recon.shape == (1, 32, 32, 3)


def test_pose_information_bottleneck():
    """The decoder sees pose ONLY via the 2K coords: two targets with the
    same pose-encoder coords must produce identical reconstructions."""
    model, variables = init_model(jax.random.PRNGKey(0), TINY, batch=1)
    src = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    coords = jnp.asarray([[[0.1, -0.2], [0.3, 0.4], [-0.5, 0.0], [0.0, 0.6]]])
    content = model.apply(variables, src, method=model.encode_content)
    r1 = model.apply(variables, content, coords, method=model.generate)
    r2 = model.apply(variables, content, coords, method=model.generate)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))
    assert r1.shape == (1, 32, 32, 3)


def test_swap_path():
    from imm_tpu.eval import pose_swap

    model, variables = init_model(jax.random.PRNGKey(0), TINY, batch=2)
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    out = pose_swap(
        model, variables["params"], variables.get("batch_stats", {}), a, b
    )
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bfloat16_compute():
    cfg = IMMConfig(
        image_size=32, n_landmarks=4, filters=(8, 8, 16, 16), strides=(1, 2, 1, 2),
        decoder_filters=(16, 8, 8), compute_dtype="bfloat16",
    )
    model, variables = init_model(jax.random.PRNGKey(0), cfg, batch=1)
    x = jnp.zeros((1, 32, 32, 3))
    out = model.apply(variables, x, x, train=False)
    # outputs are float32 at the boundary; params stay float32
    assert out.recon.dtype == jnp.float32
    kernel = variables["params"]["content_encoder"]["trunk"]["ConvBlock_0"]["Conv_0"]["kernel"]
    assert kernel.dtype == jnp.float32


def test_k30_and_k20_model_variants():
    """The AFLW (K=30) and cat-heads (K=20) model shapes build and run."""
    for k in (30, 20):
        cfg = IMMConfig(
            image_size=32, n_landmarks=k, filters=(8, 8, 16, 16),
            strides=(1, 2, 1, 2), decoder_filters=(16, 8, 8),
        )
        model, variables = init_model(jax.random.PRNGKey(0), cfg, batch=1)
        x = jnp.zeros((1, 32, 32, 3))
        out = model.apply(variables, x, x, train=False)
        assert out.coords.shape == (1, k, 2)
        assert out.gauss_maps.shape == (1, 8, 8, k)


def test_gauss_mode_variants_through_model():
    """'flat' and 'ankush' render modes work end to end (bottleneck falls
    back to the XLA path for non-'rot' modes)."""
    for mode in ("flat", "ankush"):
        cfg = IMMConfig(
            image_size=32, n_landmarks=4, filters=(8, 8, 16, 16),
            strides=(1, 2, 1, 2), decoder_filters=(16, 8, 8),
            gauss_mode=mode,
        )
        model, variables = init_model(jax.random.PRNGKey(0), cfg, batch=1)
        x = jnp.full((1, 32, 32, 3), 0.5)
        out = model.apply(variables, x, x, train=False)
        assert bool(jnp.all(jnp.isfinite(out.recon)))
        assert float(out.gauss_maps.max()) <= 1.0 + 1e-5
