"""Experiment wiring: ExperimentConfig -> model/loss/data/step/trainer.

The one place that knows how the pieces compose (the reference's
``scripts/train.py`` body, SURVEY.md §3.1, minus the tower plumbing). Used by
the CLI entry points, ``bench.py`` and ``__graft_entry__.py``.

Device placement: the experiment takes a ``Mesh`` (default: the largest
visible-device count dividing the batch, on a 1-D 'data' axis). On meshes
larger than one device the train step runs under ``jax.shard_map`` (see
``train/steps.py``); the synthetic source generates each shard's slice of
the batch inside the step, so sample synthesis scales with the slice.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from imm_tpu.data import PairSynthesizer, SyntheticBlobFaces, get_dataset
from imm_tpu.losses.perceptual import ReconstructionLoss
from imm_tpu.parallel import batch_sharding, make_mesh, replicate
from imm_tpu.train.loop import Trainer, TrainerOptions
from imm_tpu.train.state import TrainState, create_train_state
from imm_tpu.train.steps import (
    make_eval_coords_fn,
    make_train_step,
)
from imm_tpu.utils.config import ExperimentConfig
from imm_tpu.utils.device_init import devices_or_timeout


def _stack_batches(it: Iterator[dict], n: int) -> Iterator[dict]:
    """Group n host batches into one (n, B, ...) super-batch for lax.scan."""
    while True:
        group = [next(it) for _ in range(n)]
        yield {k: np.stack([g[k] for g in group]) for k in group[0]}


@dataclasses.dataclass
class Experiment:
    config: ExperimentConfig
    mesh: Any
    model: Any
    state: TrainState
    loss_fn: ReconstructionLoss
    step_fn: Any  # (state, batch, rng) -> (state, metrics)
    batches: Iterator[dict] | None
    eval_fn: Any  # (state) -> dict[str, float] | None
    trainer: Trainer
    restore: bool = True

    def run(self) -> TrainState:
        if self.restore:
            self.trainer.restore_or_init()
        self.state = self.trainer.run()
        return self.state


def build_experiment(
    config: ExperimentConfig,
    mesh=None,
    total_steps: int | None = None,
    restore: bool = True,
    inference_only: bool = False,
) -> Experiment:
    """Wire a full experiment from config.

    ``restore=False`` starts fresh even if the workdir has checkpoints.
    ``inference_only=True`` skips the data pipeline / train step / eval
    wiring entirely — for loading a checkpoint to run generation (the swap
    CLI works offline without the training dataset on disk).
    """
    if mesh is None:
        # the data axis must divide the batch: use the largest such device
        # count; first-touch init is bounded so a wedged relay fails fast
        # instead of blocking ~25 min (utils/device_init.py)
        n_dev = len(devices_or_timeout())
        while config.train.batch_size % n_dev:
            n_dev -= 1
        mesh = make_mesh(n_dev)
    model_config = config.model
    if mesh.size > 1 and model_config.norm == "batch":
        # shard_map DP: BatchNorm must pmean across the data axis explicitly
        model_config = dataclasses.replace(model_config, axis_name="data")
    loss_fn = ReconstructionLoss(config.loss)
    model, state = create_train_state(
        jax.random.PRNGKey(config.train.seed), model_config, config.train,
        loss_fn.n_terms,
    )
    state = replicate(state, mesh)
    pair = PairSynthesizer(config.pair)
    scan = config.train.steps_per_call
    batch = config.train.batch_size
    steps = total_steps if total_steps is not None else config.train.total_steps

    pair_mode = config.data.pair_mode

    eval_builder = None
    if inference_only:
        trainer = Trainer(
            None, state, total_steps=0, batch_size=batch,
            options=TrainerOptions(workdir=config.workdir or None),
        )
        return Experiment(
            config=config, mesh=mesh, model=model, state=state,
            loss_fn=loss_fn, step_fn=None, batches=None, eval_fn=None,
            trainer=trainer, restore=restore,
        )
    if config.data.source == "synthetic":
        faces = SyntheticBlobFaces(
            image_size=config.model.image_size,
            pair_pose_gap=config.data.temporal_pose_gap,
        )

        # Fully on-device step: generation lives INSIDE the (shard_map'd)
        # jitted program — each shard synthesizes its slice of the batch from
        # a fold_in'd key. Zero host bytes, zero cross-chip data movement.
        from imm_tpu.train.steps import make_synthetic_train_step

        if pair_mode == "tps":

            def sample_batch(rng, b=batch):
                return {"image": faces.sample(rng, b)["image"]}
        else:

            def sample_batch(rng, b=batch):
                out = faces.sample_pair(rng, b)
                return {"image_a": out["image_a"], "image_b": out["image_b"]}

        step_fn = make_synthetic_train_step(
            model, loss_fn, config.train, pair, sample_batch,
            pair_mode=pair_mode, scan_steps=scan, mesh=mesh,
        )
        batches = None

        # The synthetic eval set is deterministic (fixed keys), so build it
        # once and cache — re-jitting a fresh lambda per eval would recompile
        # and regenerate on every eval cycle.
        _eval_cache: list = []

        def eval_builder():
            if not _eval_cache:
                n = config.eval_samples
                sample = jax.jit(lambda r: faces.sample(r, n))
                _eval_cache.append(
                    (
                        jax.device_get(sample(jax.random.PRNGKey(91))),
                        jax.device_get(sample(jax.random.PRNGKey(92))),
                    )
                )
            return _eval_cache[0]

    else:
        pipeline = config.data.host_pipeline
        if pipeline not in ("threaded", "tfdata"):
            raise ValueError(f"unknown data.host_pipeline: {pipeline!r}")
        if pipeline == "tfdata" and pair_mode == "temporal":
            raise ValueError(
                "data.host_pipeline='tfdata' supports tps pair mode only; "
                "temporal pair sampling uses the threaded loader"
            )
        step_fn = make_train_step(
            model, loss_fn, config.train, pair, pair_mode, scan_steps=scan,
            mesh=mesh,
        )
        dataset = get_dataset(
            config.data.source,
            config.data.root,
            image_size=config.model.image_size,
            n_landmarks=config.model.n_landmarks,
        )
        # Multi-host: each process loads/decodes only its interleaved slice of
        # the dataset and feeds batch/process_count samples; the global array
        # is assembled below. Single host degenerates to the full batch.
        from imm_tpu.parallel.distributed import process_shard_spec

        shard_spec = process_shard_spec()
        n_proc = jax.process_count()
        if batch % n_proc:
            raise ValueError(
                f"global batch {batch} not divisible by {n_proc} processes"
            )
        local_batch = batch // n_proc
        local_seed = config.train.seed + jax.process_index()
        if pair_mode == "temporal":
            raw = dataset.train_pair_batches(
                local_batch, seed=local_seed, shard=shard_spec
            )
        elif pipeline == "tfdata":
            raw = dataset.tfdata_batches(
                local_batch, seed=local_seed, shard=shard_spec
            )
        else:
            raw = dataset.train_batches(
                local_batch, seed=local_seed, shard=shard_spec
            )
        host_it = _stack_batches(raw, scan) if scan > 1 else raw
        # scan super-batches are (scan, batch, ...): shard axis 1, not axis 0
        b_shard = batch_sharding(mesh, scan_axis=scan > 1)

        def _device_batches():
            for b in host_it:
                # per-process local shards -> one global jax.Array; on a
                # single host this is exactly device_put(x, b_shard)
                yield jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        b_shard, np.asarray(x)
                    ),
                    b,
                )

        # Double-buffered host pipeline: super-batch stacking and the
        # host->device transfer for call N+1 overlap the device compute of
        # call N (decode prefetch lives in the dataset iterators themselves).
        # The source is bounded to exactly what the trainer + the one viz
        # batch can pull, so the producer thread terminates and releases its
        # buffered device arrays when training ends (resume runs pull fewer
        # and rely on the daemon flag). The thread starts on first pull, so
        # eval-only builds (total_steps=0, never iterated) do no decode work.
        import itertools

        from imm_tpu.data.datasets import prefetch_iterator

        # ceil + the viz batch + one slack pull (tests/diagnostics inspect a
        # live batch after the run); leftovers ≤ depth so the producer can
        # still flush its STOP sentinel and exit in the common paths.
        n_calls = -(-steps // scan) + 2
        batches = prefetch_iterator(
            itertools.islice(_device_batches(), n_calls), depth=2
        )

        def eval_builder():
            return dataset.eval_arrays("train"), dataset.eval_arrays("test")

    coords_fn = make_eval_coords_fn(model)

    # Periodic image panels (the reference's TensorBoard summaries existed for
    # ALL datasets — SURVEY §5): a fixed small batch through pair synthesis +
    # the model in eval mode, for both tps and temporal pair modes. The jitted
    # forward is defined ONCE (a per-call lambda would recompile every viz).
    _viz_cache: list = []
    _viz_key = jax.random.PRNGKey(1234)

    @jax.jit
    def _viz_fwd(params, batch_stats, viz_batch):
        if pair_mode == "tps":
            src, tgt = pair(_viz_key, viz_batch["image"])
        else:  # temporal: frame_a -> source (jittered), frame_b -> target
            src, tgt = pair.temporal_pair(
                _viz_key, viz_batch["image_a"], viz_batch["image_b"]
            )
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, src, tgt, train=False)
        return src, tgt, out

    _viz_keys = ("image",) if pair_mode == "tps" else ("image_a", "image_b")

    def viz_fn(state):
        from imm_tpu.utils.viz import training_summary_panel

        if not _viz_cache:
            if config.data.source == "synthetic":
                viz_faces = SyntheticBlobFaces(
                    image_size=config.model.image_size,
                    pair_pose_gap=config.data.temporal_pose_gap,
                )
                if pair_mode == "tps":
                    _viz_cache.append(
                        {"image": viz_faces.sample(_viz_key, 4)["image"]}
                    )
                else:
                    p = viz_faces.sample_pair(_viz_key, 4)
                    _viz_cache.append(
                        {"image_a": p["image_a"], "image_b": p["image_b"]}
                    )
            else:  # consume ONE training batch, once, and reuse
                b = next(iter(batches))

                # On multi-host meshes the batch is a global array spanning
                # non-addressable devices — eager slicing would raise. Read
                # this process's local shards instead (batch axis is 1 for
                # scan super-batches, else 0); works single-host too.
                def local_slice(leaf):
                    axis = 1 if scan > 1 else 0
                    local = np.concatenate(
                        [np.asarray(s.data) for s in leaf.addressable_shards],
                        axis=axis,
                    )
                    if scan > 1:  # strip the lax.scan super-batch axis
                        local = local[0]
                    return jnp.asarray(local[:4])

                _viz_cache.append({k: local_slice(b[k]) for k in _viz_keys})
        viz_batch = _viz_cache[0]

        src, tgt, out = _viz_fwd(state.params, state.batch_stats, viz_batch)
        return training_summary_panel(
            np.asarray(src, np.float32),
            np.asarray(tgt, np.float32),
            np.asarray(out.recon),
            np.asarray(out.coords),
            np.asarray(out.gauss_maps),
        )

    def eval_fn(state):
        from imm_tpu.eval import evaluate_landmarks

        train_split, test_split = eval_builder()
        # with param_ema_decay on, report the Polyak-averaged params
        # alongside the raw ones (suffix _ema) so a single run A/Bs the
        # lever — same splits, same shared BatchNorm statistics
        param_sets = {"": state.params}
        if state.ema_params is not None:
            param_sets["_ema"] = state.ema_params
        metrics = {}
        for suffix, params in param_sets.items():
            m = evaluate_landmarks(
                coords_fn,
                params,
                state.batch_stats,
                train_split,
                test_split,
                norm=config.data.eval_norm,
                iod_points=config.data.iod_points,
            )
            metrics.update({f"{k}{suffix}": v for k, v in m.items()})
        return metrics

    trainer = Trainer(
        step_fn,
        state,
        total_steps=steps,
        batch_size=batch,
        steps_per_call=scan,
        batches=batches,
        options=TrainerOptions(
            workdir=config.workdir or None,
            stall_timeout_s=config.stall_timeout_s,
        ),
        seed=config.train.seed,
        eval_fn=eval_fn if config.eval_every else None,
        eval_every=config.eval_every,
        viz_fn=viz_fn if config.eval_every else None,
    )
    return Experiment(
        config=config,
        mesh=mesh,
        model=model,
        state=state,
        loss_fn=loss_fn,
        step_fn=step_fn,
        batches=batches,
        eval_fn=eval_fn,
        trainer=trainer,
        restore=restore,
    )
