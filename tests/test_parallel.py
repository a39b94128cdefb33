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

from tests.common import TINY  # noqa: E402


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


def test_shard_map_step_matches_single_device():
    """The explicit shard_map DP path (used on real multi-chip meshes so
    Pallas kernels partition) must match the single-device step."""
    import dataclasses

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=16, lr_boundaries=(), lr_factors=(1.0,), optimizer="sgd"
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(16, 32, 32, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(7)

    # single device reference (no mesh)
    model_1, state_1 = create_train_state(jax.random.PRNGKey(0), TINY, tcfg, loss_fn.n_terms)
    pair = PairSynthesizer(dataclasses.replace(PairConfig(), enable_warp=False, enable_jitter=False))
    step_1 = make_train_step(model_1, loss_fn, tcfg, pair, "tps", donate=False)
    out_1, m_1 = step_1(state_1, {"image": imgs}, rng)

    # 8-way shard_map: BN pmeans via axis_name
    mesh = make_mesh(8)
    cfg_8 = dataclasses.replace(TINY, axis_name="data")
    model_8, state_8 = create_train_state(jax.random.PRNGKey(0), cfg_8, tcfg, loss_fn.n_terms)
    step_8 = make_train_step(model_8, loss_fn, tcfg, pair, "tps", donate=False, mesh=mesh)
    out_8, m_8 = step_8(
        replicate(state_8, mesh), shard_batch({"image": imgs}, mesh), rng
    )

    np.testing.assert_allclose(
        float(m_1["loss/total"]), float(m_8["loss/total"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(out_1.params), jax.tree.leaves(out_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(out_1.batch_stats), jax.tree.leaves(out_8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_synthetic_step():
    """Fully on-device generation + training under shard_map: each shard
    draws its slice of the batch; state stays replicated and identical."""
    import dataclasses

    from imm_tpu.data import SyntheticBlobFaces
    from imm_tpu.train.steps import make_synthetic_train_step

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(batch_size=16, lr_boundaries=(), lr_factors=(1.0,))
    mesh = make_mesh(8)
    cfg = dataclasses.replace(TINY, axis_name="data")
    model, state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, loss_fn.n_terms)
    faces = SyntheticBlobFaces(image_size=32)
    pair = PairSynthesizer(PairConfig())
    step = make_synthetic_train_step(
        model, loss_fn, tcfg, pair,
        lambda rng, b: faces.sample(rng, b),
        scan_steps=2, donate=False, mesh=mesh,
    )
    state2, metrics = step(replicate(state, mesh), jax.random.PRNGKey(1))
    assert int(state2.step) == 2
    assert np.isfinite(float(metrics["loss/total"]))
    # replicated outputs: every device holds identical params
    p0 = jax.tree.leaves(state2.params)[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_shard_map_equivariance_step():
    """The opt-in equivariance extension under shard_map: per-shard warps +
    pmean'd loss term must train and keep replicas bitwise identical."""
    import dataclasses

    loss_fn = ReconstructionLoss(
        PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1))
    )
    tcfg = TrainConfig(
        batch_size=16, lr_boundaries=(), lr_factors=(1.0,), equi_weight=0.5
    )
    mesh = make_mesh(8)
    cfg = dataclasses.replace(TINY, axis_name="data")
    model, state = create_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, loss_fn.n_terms
    )
    pair = PairSynthesizer(PairConfig())
    step = make_train_step(model, loss_fn, tcfg, pair, "tps", donate=False, mesh=mesh)
    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(size=(16, 32, 32, 3)).astype(np.float32)
    )
    state2, metrics = step(
        replicate(state, mesh), shard_batch({"image": imgs}, mesh),
        jax.random.PRNGKey(5),
    )
    assert np.isfinite(float(metrics["loss/equi"]))
    assert np.isfinite(float(metrics["loss/total"]))
    p0 = jax.tree.leaves(state2.params)[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
