"""Trainer loop: run, checkpoint, resume (SURVEY.md §5 checkpoint/resume)."""

import numpy as np

from imm_tpu.configs import get_preset
from imm_tpu.experiment import build_experiment


def test_trainer_runs_and_checkpoints(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(
        get_preset("tiny_cpu"), workdir=str(tmp_path / "run")
    )
    exp = build_experiment(cfg, total_steps=10)
    exp.trainer.options.checkpoint_every = 5
    state = exp.run()
    assert int(state.step) == 10
    assert len(exp.trainer.history) > 0
    assert np.isfinite(exp.trainer.history[-1]["loss/total"])

    # a fresh experiment restores and continues from the saved step
    exp2 = build_experiment(cfg, total_steps=12)
    restored = exp2.trainer.restore_or_init()
    assert int(restored.step) == 10
    state2 = exp2.trainer.run()
    assert int(state2.step) == 12


def test_eval_fn_on_synthetic(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(get_preset("tiny_cpu"), eval_samples=32)
    exp = build_experiment(cfg, total_steps=0)
    results = exp.eval_fn(exp.state)
    assert "landmark_error_test_pct" in results
    assert np.isfinite(results["landmark_error_test_pct"])


def test_viz_utilities():
    from imm_tpu.utils.viz import (
        colorize_landmark_maps,
        image_grid,
        landmark_colors,
        overlay_landmarks,
    )

    maps = np.random.default_rng(0).uniform(size=(2, 8, 8, 5)).astype(np.float32)
    colored = colorize_landmark_maps(maps)
    assert colored.shape == (2, 8, 8, 3)
    assert colored.max() <= 1.0 + 1e-6

    colors = landmark_colors(10)
    assert colors.shape == (10, 3)
    assert len({tuple(c) for c in colors.round(3)}) == 10  # distinct

    imgs = np.zeros((2, 16, 16, 3), np.float32)
    coords = np.asarray([[[0.0, 0.0], [-1.0, -1.0]]] * 2, np.float32)
    over = overlay_landmarks(imgs, coords, radius=1)
    assert over[0, 8, 8].sum() > 0  # center dot drawn
    assert over[0, 0, 0].sum() > 0  # corner dot drawn

    grid = image_grid(np.ones((5, 4, 4, 3)), n_cols=2)
    assert grid.shape == (3 * 4, 2 * 4, 3)


def test_temporal_experiment_path(tmp_path):
    """Synthetic video-style pairs through the temporal train path (the
    Human3.6M structure, driver config 4) end-to-end on CPU."""
    import dataclasses

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment

    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        pair=dataclasses.replace(base.pair, enable_warp=False),
        data=dataclasses.replace(base.data, pair_mode="temporal", eval_norm="size"),
    )
    exp = build_experiment(cfg, total_steps=3)
    state = exp.run()
    assert int(state.step) == 3
    assert np.isfinite(exp.trainer.history[-1]["loss/total"])
    results = exp.eval_fn(state)
    assert np.isfinite(results["landmark_error_test_pct"])


def test_file_backed_experiment_end_to_end(tmp_path):
    """CelebA-format fixture -> build_experiment -> train -> eval: the whole
    file-backed seam (loader, prefetch, stacked scan batches, eval arrays)."""
    import dataclasses

    from tests.test_data import _make_celeba

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment
    from imm_tpu.utils.config import DataConfig

    root = str(tmp_path / "celeba")
    _make_celeba(root, n=8)
    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        train=dataclasses.replace(base.train, batch_size=2, steps_per_call=2),
        data=DataConfig(source="celeba", root=root, pair_mode="tps"),
    )
    exp = build_experiment(cfg, total_steps=4)
    state = exp.run()
    assert int(state.step) == 4
    results = exp.eval_fn(state)
    assert np.isfinite(results["landmark_error_test_pct"])


def test_file_backed_multidevice_scan_sharding(tmp_path):
    """Host-fed DP with scan super-batches on a mesh > 1 (the VERDICT r1 /
    ADVICE-high defect): super-batches are (scan, batch, ...) — the batch
    axis (axis 1) must be sharded, never the scan axis. steps_per_call=5 is
    deliberately indivisible by the 8-device mesh so any leading-axis
    sharding fails loudly at device_put."""
    import dataclasses

    import jax

    from tests.test_data import _make_celeba

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment
    from imm_tpu.parallel import make_mesh
    from imm_tpu.utils.config import DataConfig

    root = str(tmp_path / "celeba")
    _make_celeba(root, n=16)
    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        train=dataclasses.replace(base.train, batch_size=8, steps_per_call=5),
        data=DataConfig(source="celeba", root=root, pair_mode="tps"),
        eval_every=15,  # also wires eval + the viz panel into the run
    )
    mesh = make_mesh(8)
    exp = build_experiment(cfg, mesh=mesh, total_steps=20)  # >= 2 dispatches
    state = exp.run()
    assert int(state.step) == 20
    assert np.isfinite(exp.trainer.history[-1]["loss/total"])
    # the host batch really lands batch-axis-sharded (axis 1), scan axis whole
    b = next(iter(exp.batches))
    leaf = b["image"]
    assert leaf.shape[0] == 5 and leaf.shape[1] == 8
    spec = leaf.sharding.spec
    assert tuple(spec)[:2] == (None, "data"), spec
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(5, 1) + leaf.shape[2:]}
    # the viz path must read the sharded batch via addressable shards (a
    # global array spanning non-addressable devices on multi-host cannot be
    # sliced eagerly) — exercise it on the sharded mesh
    panel = exp.trainer.viz_fn(state)
    assert np.asarray(panel).ndim == 3
    del exp, b, leaf
    jax.clear_caches()


def test_tfdata_host_pipeline_end_to_end(tmp_path):
    """data.host_pipeline='tfdata' routes the file-backed tps path through
    the tf.data feed (VERDICT r2 weak #7: previously a parity module no
    production config could reach)."""
    import dataclasses

    import pytest

    pytest.importorskip("tensorflow")
    from tests.test_data import _make_celeba

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment
    from imm_tpu.utils.config import DataConfig

    root = str(tmp_path / "celeba")
    _make_celeba(root, n=8)
    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        train=dataclasses.replace(base.train, batch_size=2, steps_per_call=2),
        data=DataConfig(
            source="celeba", root=root, pair_mode="tps", host_pipeline="tfdata"
        ),
    )
    exp = build_experiment(cfg, total_steps=4)
    state = exp.run()
    assert int(state.step) == 4
    assert np.isfinite(exp.trainer.history[-1]["loss/total"])

    # temporal + tfdata is an explicit, loud error (not a silent fallback)
    import pytest as _pytest

    bad = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, source="human36m", pair_mode="temporal"
        ),
    )
    with _pytest.raises(ValueError, match="tfdata"):
        build_experiment(bad, total_steps=1)

    unknown = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, host_pipeline="grain")
    )
    with _pytest.raises(ValueError, match="host_pipeline"):
        build_experiment(unknown, total_steps=1)


def test_temporal_viz_panel():
    """Temporal-mode runs get image summaries too (VERDICT r2 weak #6: panels
    were gated on pair_mode == 'tps')."""
    import dataclasses

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment

    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        pair=dataclasses.replace(base.pair, enable_warp=False),
        data=dataclasses.replace(base.data, pair_mode="temporal"),
        eval_every=2,
        eval_samples=16,
    )
    exp = build_experiment(cfg, total_steps=2)
    assert exp.trainer.viz_fn is not None
    panel = exp.trainer.viz_fn(exp.state)
    p = np.asarray(panel)
    assert p.ndim == 3 and p.shape[-1] == 3 and np.isfinite(p).all()


def test_restore_false_starts_fresh(tmp_path):
    import dataclasses

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment

    cfg = dataclasses.replace(get_preset("tiny_cpu"), workdir=str(tmp_path / "w"))
    exp = build_experiment(cfg, total_steps=4)
    exp.trainer.options.checkpoint_every = 2
    exp.run()

    fresh = build_experiment(cfg, total_steps=2, restore=False)
    state = fresh.run()
    # started from 0, not from the saved step-4 checkpoint
    assert int(state.step) == 2


def test_stall_watchdog_fires_and_normal_run_does_not(tmp_path):
    """Failure detection (SURVEY.md §5): a wedged step trips the watchdog;
    a healthy run never does."""
    import threading
    import time as _time

    from imm_tpu.train.loop import Trainer, TrainerOptions

    # healthy: tiny fast steps, generous timeout -> no stall
    import dataclasses

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment

    cfg = dataclasses.replace(get_preset("tiny_cpu"))
    exp = build_experiment(cfg, total_steps=2)
    exp.trainer.options.stall_timeout_s = 120.0
    exp.trainer._start_watchdog()
    fired = []
    exp.trainer._on_stall = lambda: fired.append(True)
    exp.run()
    assert not fired

    # wedged: a step that never returns trips the watchdog quickly
    stalled = threading.Event()

    def hung_step(state, rng):
        stalled.wait(timeout=10.0)  # simulate a lost device RPC
        raise RuntimeError("unreachable in this test")

    t = Trainer(
        hung_step, exp.state, total_steps=10_000, batch_size=1,
        options=TrainerOptions(stall_timeout_s=1.0),
    )
    t._on_stall = lambda: (fired.append(True), stalled.set())

    runner = threading.Thread(target=lambda: _swallow(t), daemon=True)

    def _swallow(tr):
        try:
            tr.run()
        except Exception:
            pass

    runner = threading.Thread(target=lambda: _swallow(t), daemon=True)
    runner.start()
    deadline = _time.time() + 15
    while not fired and _time.time() < deadline:
        _time.sleep(0.2)
    stalled.set()
    assert fired, "watchdog did not fire on a stalled step"


def test_watchdog_disarmed_after_run_completes():
    """The daemon watchdog must never fire after a SUCCESSFUL run: its
    thread outlives run(), and a stale _last_progress once killed a sweep
    process ~timeout seconds after the previous variant finished."""
    import time as _time

    import dataclasses

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment

    cfg = dataclasses.replace(get_preset("tiny_cpu"))
    exp = build_experiment(cfg, total_steps=2)
    exp.run()
    # run() is over and _last_progress is now permanently stale — an armed
    # watchdog must still stay quiet because the loop is not live
    exp.trainer.options.stall_timeout_s = 0.4  # watch ticks every 0.1s
    fired = []
    exp.trainer._on_stall = lambda: fired.append(True)
    exp.trainer._start_watchdog()
    _time.sleep(1.2)  # well past the timeout, with run() finished
    assert not fired, "watchdog fired after a successful run"


def test_eval_reports_ema_metrics_when_enabled():
    """train.param_ema_decay > 0 -> eval reports raw AND *_ema metrics."""
    import dataclasses

    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        eval_samples=32,
        train=dataclasses.replace(base.train, param_ema_decay=0.5),
    )
    exp = build_experiment(cfg, total_steps=4)
    state = exp.run()
    results = exp.eval_fn(state)
    assert "landmark_error_test_pct" in results
    assert "landmark_error_test_pct_ema" in results
    assert np.isfinite(results["landmark_error_test_pct_ema"])
    # at step 4 with decay 0.5 the EMA sits between init and current params,
    # so the two evals run on genuinely different parameters
    assert results["landmark_error_test_pct_ema"] != results[
        "landmark_error_test_pct"
    ]


def test_restore_reconciles_ema_structure_both_directions(tmp_path):
    """The optional ema_params checkpoint node must not require replaying
    the training-time param_ema_decay override at restore time (the
    generate --ema / resume-after-flipping-the-lever failure)."""
    import dataclasses

    import jax

    base = get_preset("tiny_cpu")

    # EMA-trained checkpoint ...
    cfg_ema = dataclasses.replace(
        base,
        workdir=str(tmp_path / "ema_run"),
        train=dataclasses.replace(base.train, param_ema_decay=0.5),
    )
    exp = build_experiment(cfg_ema, total_steps=4)
    exp.trainer.options.checkpoint_every = 2
    state = exp.run()
    assert state.ema_params is not None

    # ... restored with the DEFAULT config (decay=0): EMA params must
    # survive so generate --ema works without replaying the override
    cfg_plain = dataclasses.replace(base, workdir=str(tmp_path / "ema_run"))
    exp2 = build_experiment(cfg_plain, total_steps=4)
    restored = exp2.trainer.restore_or_init()
    assert int(restored.step) == 4
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]),
    )

    # plain checkpoint restored with EMA enabled: lever turns on mid-run,
    # EMA seeded from the restored params
    cfg_plain2 = dataclasses.replace(base, workdir=str(tmp_path / "plain_run"))
    exp3 = build_experiment(cfg_plain2, total_steps=4)
    exp3.trainer.options.checkpoint_every = 2
    state3 = exp3.run()
    assert state3.ema_params is None
    cfg_ema2 = dataclasses.replace(
        base,
        workdir=str(tmp_path / "plain_run"),
        train=dataclasses.replace(base.train, param_ema_decay=0.5),
    )
    exp4 = build_experiment(cfg_ema2, total_steps=4)
    restored4 = exp4.trainer.restore_or_init()
    assert int(restored4.step) == 4
    assert restored4.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored4.ema_params)[0]),
        np.asarray(jax.tree.leaves(restored4.params)[0]),
    )
