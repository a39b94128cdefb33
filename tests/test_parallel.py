"""Data-parallel correctness on the virtual 8-device CPU mesh (SURVEY.md §4):
the sharded train step must match the single-device step on the same batch."""

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.data import PairConfig, PairSynthesizer
from imm_tpu.losses import PerceptualLossConfig, ReconstructionLoss
from imm_tpu.models import IMMConfig
from imm_tpu.parallel import make_mesh, replicate, shard_batch
from imm_tpu.train import TrainConfig, create_train_state
from imm_tpu.train.steps import make_train_step

TINY = IMMConfig(
    image_size=32,
    n_landmarks=4,
    filters=(8, 8, 16, 16),
    strides=(1, 2, 1, 2),
    decoder_filters=(16, 8, 8),
    norm="batch",  # deliberately: BN means must be GLOBAL under sharding
)


def _build():
    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    # SGD: Adam's 1/sqrt(v) amplifies float reduction-order noise into
    # update sign flips on near-zero gradients; with SGD the param delta is
    # linear in the gradient so single-vs-sharded agreement is tight.
    tcfg = TrainConfig(
        batch_size=16, lr_boundaries=(), lr_factors=(1.0,), optimizer="sgd"
    )
    model, state = create_train_state(
        jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(PairConfig())
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False)
    return step, state


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_sharded_step_matches_single_device():
    step, state = _build()
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(16, 32, 32, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(7)

    # single device
    state_1, metrics_1 = step(state, {"image": imgs}, rng)

    # 8-way data parallel: replicate state, shard batch
    mesh = make_mesh(8)
    state_8in = replicate(state, mesh)
    batch_8 = shard_batch({"image": imgs}, mesh)
    state_8, metrics_8 = step(state_8in, batch_8, rng)

    np.testing.assert_allclose(
        float(metrics_1["loss/total"]), float(metrics_8["loss/total"]), rtol=1e-5
    )
    flat_1 = jax.tree.leaves(state_1.params)
    flat_8 = jax.tree.leaves(state_8.params)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # batch-norm running stats must also agree (global-batch semantics)
    for a, b in zip(jax.tree.leaves(state_1.batch_stats), jax.tree.leaves(state_8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_uneven_mesh_sizes():
    """DP must work for any divisor mesh (2 and 4 devices)."""
    step, state = _build()
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(size=(16, 32, 32, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(3)
    ref_state, ref_metrics = step(state, {"image": imgs}, rng)
    for n in (2, 4):
        mesh = make_mesh(n)
        s, m = step(replicate(state, mesh), shard_batch({"image": imgs}, mesh), rng)
        np.testing.assert_allclose(
            float(m["loss/total"]), float(ref_metrics["loss/total"]), rtol=1e-5
        )
