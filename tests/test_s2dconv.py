"""Space-to-depth conv reformulation: exact equivalence to the direct conv.

The op only earns its keep on TPU (MXU shapes); correctness is backend-
independent, so the property — same function, different schedule — is
checked here on CPU for the kernel/block shapes the model and VGG use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tpu.ops.s2dconv import (
    depth_to_space,
    reference_conv,
    s2d_conv,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)))
    for b in (2, 4):
        y = depth_to_space(space_to_depth(x, b), b)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize(
    "kh,cin,cout,block",
    [
        (7, 3, 32, 2),  # the model's entry conv
        (7, 3, 32, 4),
        (3, 3, 64, 2),  # VGG conv1_1
        (3, 32, 32, 2),  # model layer 1
        (5, 4, 8, 2),
    ],
)
def test_s2d_conv_matches_direct(kh, cin, cout, block):
    rng = np.random.default_rng(kh * 100 + block)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(kh, kh, cin, cout)).astype(np.float32) * 0.1
    )
    direct = reference_conv(x, k)
    blocked = s2d_conv(x, k, block)
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_convblock_s2d_matches_direct():
    """ConvBlock(s2d_block=2) computes the same function as the direct block
    when fed the same kernel values (norm='none' isolates the conv+bias)."""
    from imm_tpu.models.nets import ConvBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))

    direct = ConvBlock(8, kernel=7, stride=1, norm="none")
    blocked = ConvBlock(8, kernel=7, stride=1, norm="none", s2d_block=2)
    p_direct = direct.init(jax.random.PRNGKey(0), x)["params"]
    p_blocked = blocked.init(jax.random.PRNGKey(0), x)["params"]
    # graft the direct kernel/bias into the s2d param structure
    p_blocked = {
        "s2d_kernel": p_direct["Conv_0"]["kernel"],
        "s2d_bias": p_direct["Conv_0"]["bias"],
    }
    y_direct = direct.apply({"params": p_direct}, x)
    y_blocked = blocked.apply({"params": p_blocked}, x)
    np.testing.assert_allclose(
        np.asarray(y_blocked), np.asarray(y_direct), rtol=1e-5, atol=1e-5
    )


def test_imm_entry_s2d_end_to_end():
    """IMM with entry_s2d trains a step and produces finite outputs."""
    import dataclasses

    from imm_tpu.models.imm import IMMConfig, init_model

    cfg = IMMConfig(
        n_landmarks=5,
        image_size=32,
        filters=(8, 8, 16, 16),
        strides=(1, 2, 1, 2),
        decoder_filters=(16, 8, 8),
        entry_s2d=2,
    )
    model, variables = init_model(jax.random.PRNGKey(0), cfg, batch=2)
    assert "s2d_kernel" in str(jax.tree_util.tree_structure(variables))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    )
    out = model.apply(variables, x, x, train=False)
    assert out.recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out.recon)).all()
    assert np.isfinite(np.asarray(out.coords)).all()
    # stride-1 requirement enforced
    bad = dataclasses.replace(
        cfg, strides=(2, 2, 1, 2), decoder_filters=(16, 8, 8, 8)
    )
    with pytest.raises(ValueError, match="stride-1"):
        init_model(jax.random.PRNGKey(0), bad, batch=1)


def test_s2d_conv_gradients_match():
    """The reformulation must be exact under differentiation too (it sits in
    the trained model's forward)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)

    g_direct = jax.grad(lambda k: jnp.sum(jnp.sin(reference_conv(x, k))))(k)
    g_blocked = jax.grad(lambda k: jnp.sum(jnp.sin(s2d_conv(x, k, 2))))(k)
    np.testing.assert_allclose(
        np.asarray(g_blocked), np.asarray(g_direct), rtol=1e-4, atol=1e-5
    )
