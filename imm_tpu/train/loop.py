"""Trainer shell: step loop, metrics, checkpointing, throughput accounting.

Replaces the reference's session loop + ``tf.train.Saver`` + ``tf.summary``
stack (SURVEY.md §3.1/§5) with:

- a host loop driving the jitted (possibly multi-step-scanned) train step;
- Orbax checkpointing (save/restore-or-init, keep-N policy) — crash recovery
  is "restart and resume from latest" exactly like the reference, minus the
  Saver;
- structured stdout metrics + optional TensorBoard via ``clu.metric_writers``;
- an images/sec/chip counter (the driver's throughput metric).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from collections.abc import Callable, Iterator
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("imm_tpu")


@dataclasses.dataclass
class TrainerOptions:
    workdir: str | None = None
    log_every: int = 50  # in optimizer steps
    checkpoint_every: int = 1000
    keep_checkpoints: int = 3
    tensorboard: bool = False
    # Failure detection (SURVEY.md §5): a wedged device/tunnel blocks the
    # host loop forever with zero signal (observed on this machine: an RPC
    # lost mid-run froze training silently for 15+ min). If no step completes
    # within this many seconds, the watchdog aborts the process so a
    # supervisor can restart it — training auto-resumes from the latest
    # Orbax checkpoint. 0 disables.
    stall_timeout_s: float = 0.0


class Trainer:
    """Drives a jitted step function to ``total_steps``.

    ``step_fn`` signature is either ``(state, rng) -> (state, metrics)``
    (on-device data, e.g. the synthetic harness) or
    ``(state, batch, rng) -> (state, metrics)`` with ``batches`` an iterator.
    """

    def __init__(
        self,
        step_fn: Callable,
        state,
        total_steps: int,
        batch_size: int,
        steps_per_call: int = 1,
        batches: Iterator[dict[str, np.ndarray]] | None = None,
        options: TrainerOptions = TrainerOptions(),
        seed: int = 0,
        eval_fn: Callable[[Any], dict[str, float]] | None = None,
        eval_every: int = 0,
        viz_fn: Callable[[Any], Any] | None = None,
    ):
        self.step_fn = step_fn
        self.state = state
        self.total_steps = total_steps
        self.batch_size = batch_size
        self.steps_per_call = steps_per_call
        self.batches = batches
        self.options = options
        self.rng = jax.random.PRNGKey(seed)
        self.eval_fn = eval_fn
        self.eval_every = eval_every
        self.viz_fn = viz_fn
        self.history: list[dict[str, float]] = []
        self._writer = None
        self._ckpt_mgr = None
        self._last_progress = time.time()
        self._watch_active = False  # armed only while run() executes
        self._on_stall = None  # injectable for tests; default aborts
        if options.workdir:
            os.makedirs(options.workdir, exist_ok=True)
            self._init_checkpointing()
            if options.tensorboard:
                self._init_tensorboard()
        if options.stall_timeout_s > 0:
            self._start_watchdog()

    # -- failure detection --------------------------------------------------

    def _start_watchdog(self):
        import threading

        def watch():
            timeout = self.options.stall_timeout_s
            while True:
                time.sleep(min(timeout / 4, 60.0))
                # Watch only while the loop is live: a daemon thread outlives
                # run(), and a finished Trainer's _last_progress goes stale —
                # without this gate it would abort the process ~timeout
                # seconds after a SUCCESSFUL run (observed killing a sweep
                # between variants).
                if not self._watch_active:
                    continue
                idle = time.time() - self._last_progress
                if idle > timeout:
                    log.critical(
                        "no training progress for %.0fs (stall timeout %.0fs)"
                        " — aborting so a supervisor can restart; training"
                        " resumes from the latest checkpoint", idle, timeout,
                    )
                    if self._on_stall is not None:
                        self._on_stall()
                        return
                    os._exit(42)

        threading.Thread(target=watch, daemon=True).start()

    # -- checkpointing ----------------------------------------------------

    def _init_checkpointing(self):
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(self.options.workdir), "checkpoints")
        self._ckpt_mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.options.keep_checkpoints,
                enable_async_checkpointing=True,
            ),
        )

    def restore_or_init(self):
        """Resume from the latest checkpoint if one exists.

        The checkpoint pytree has one config-dependent optional node:
        ``ema_params`` (``TrainConfig.param_ema_decay > 0``). Restoring must
        not require the user to replay that training-time override (e.g.
        ``generate --ema`` against an EMA-trained workdir, or resuming after
        flipping the lever), so a structure mismatch on that node is
        reconciled against the on-disk layout rather than raised.
        """
        if self._ckpt_mgr is None:
            return self.state
        latest = self._ckpt_mgr.latest_step()
        if latest is not None:
            import orbax.checkpoint as ocp

            try:
                self.state = self._ckpt_mgr.restore(
                    latest, args=ocp.args.StandardRestore(self.state)
                )
            except ValueError:
                if self.state.ema_params is None:
                    # disk has EMA params, live config doesn't: restore and
                    # keep them — with decay=0 the train step carries them
                    # through unchanged, and generate --ema stays reachable
                    target = self.state.replace(
                        ema_params=jax.tree.map(jnp.copy, self.state.params)
                    )
                    self.state = self._ckpt_mgr.restore(
                        latest, args=ocp.args.StandardRestore(target)
                    )
                    log.info("checkpoint carries EMA params; restored them "
                             "(param_ema_decay=0: they stay frozen)")
                else:
                    # disk has no EMA params, live config wants them: turning
                    # the lever on mid-run — seed EMA from restored params
                    target = self.state.replace(ema_params=None)
                    restored = self._ckpt_mgr.restore(
                        latest, args=ocp.args.StandardRestore(target)
                    )
                    self.state = restored.replace(
                        ema_params=jax.tree.map(jnp.copy, restored.params)
                    )
                    log.info("checkpoint has no EMA params; seeding EMA "
                             "from the restored params")
            log.info("restored checkpoint at step %d", latest)
        return self.state

    def save(self, wait: bool = False):
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        self._ckpt_mgr.save(step, args=ocp.args.StandardSave(self.state))
        if wait:
            self._ckpt_mgr.wait_until_finished()

    # -- metrics ----------------------------------------------------------

    def _init_tensorboard(self):
        try:
            from clu import metric_writers

            self._writer = metric_writers.create_default_writer(
                os.path.join(self.options.workdir, "tb")
            )
        except Exception as e:  # pragma: no cover - clu optional
            log.warning("tensorboard writer unavailable: %s", e)

    def _log(self, step: int, metrics: dict[str, float]):
        self.history.append({"step": step, **metrics})
        parts = " ".join(f"{k}={v:.5g}" for k, v in sorted(metrics.items()))
        log.info("step %d %s", step, parts)
        if self._writer is not None:
            self._writer.write_scalars(step, metrics)

    def write_image_summary(self, step: int, panel) -> None:
        """Write a (H, W, 3) float panel (see utils.viz.training_summary_panel)
        to TensorBoard and/or the workdir — the reference's image summaries."""
        import numpy as np

        panel = np.clip(np.asarray(panel, np.float32), 0.0, 1.0)
        if self._writer is not None:
            self._writer.write_images(step, {"train/panel": panel[None]})
        if self.options.workdir:
            try:
                import cv2

                path = os.path.join(
                    self.options.workdir, f"panel_{step:08d}.png"
                )
                cv2.imwrite(
                    path,
                    cv2.cvtColor((panel * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
                )
            except Exception as e:  # pragma: no cover
                log.warning("image summary write failed: %s", e)

    # -- the loop ---------------------------------------------------------

    def run(self):
        self._last_progress = time.time()
        self._watch_active = True
        try:
            return self._run()
        finally:
            self._watch_active = False

    def _run(self):
        state = self.state
        t_window = time.time()
        images_in_window = 0
        next_log = self.options.log_every
        while int(state.step) < self.total_steps:
            self.rng, k = jax.random.split(self.rng)
            if self.batches is None:
                state, metrics = self.step_fn(state, k)
            else:
                batch = next(self.batches)
                batch = jax.tree.map(jnp.asarray, batch)
                state, metrics = self.step_fn(state, batch, k)
            images_in_window += self.batch_size * self.steps_per_call
            # keep self.state current: the initial state's buffers are DONATED
            # on the first call, and save()/external readers must never touch
            # a donated array.
            self.state = state
            step = int(jax.device_get(state.step))
            self._last_progress = time.time()  # feed the stall watchdog
            if step >= next_log or step >= self.total_steps:
                jax.block_until_ready(metrics)
                dt = time.time() - t_window
                m = {k_: float(jax.device_get(v)) for k_, v in metrics.items()}
                m["images_per_sec"] = images_in_window / max(dt, 1e-9)
                self._log(step, m)
                t_window = time.time()
                images_in_window = 0
                next_log = step + self.options.log_every
            if (
                self._ckpt_mgr is not None
                and step > 0
                and step % self.options.checkpoint_every < self.steps_per_call
            ):
                self.save()
            if (
                self.eval_fn is not None
                and self.eval_every > 0
                and step % self.eval_every < self.steps_per_call
            ):
                ev = self.eval_fn(state)
                self._log(step, {f"eval/{k}": v for k, v in ev.items()})
                if self.viz_fn is not None:
                    self.write_image_summary(step, self.viz_fn(state))
        self.state = state
        if self._ckpt_mgr is not None:
            self.save(wait=True)
        return state
