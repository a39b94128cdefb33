"""Multi-host initialization + per-process data sharding (SURVEY.md §2/§5).

A single v5e-8 slice is one host — the target configuration needs none of
this. For multi-host slices/pods the wiring is live in the production path:

- ``imm_tpu.cli.train`` calls :func:`initialize_multihost` before any other
  JAX call (a no-op when no coordinator is configured in the environment);
- ``build_experiment``'s file-backed path shards the dataset per process via
  :func:`process_shard_spec`, each host loads/decodes only its slice of the
  global batch, and the global array is assembled with
  ``jax.make_array_from_process_local_data`` over the mesh sharding.

Collectives then ride ICI within a slice and DCN across slices — XLA's
partitioner decides, no NCCL/MPI-style code exists anywhere in this
framework. Multi-host execution itself is untestable on this machine (single
host, single chip); the shard arithmetic and the single-process degenerate
path are unit-tested.
"""

from __future__ import annotations

import jax


def initialize_multihost(**kwargs) -> None:
    """``jax.distributed.initialize`` with env-based defaults.

    Must run before any other JAX call touches a backend (including
    ``jax.process_count()`` — querying it would initialize local-only
    backends and make the real initialize fail). Safe to call twice and in
    single-process environments.
    """
    import os

    def _int(v):
        try:
            return int(v)
        except (TypeError, ValueError):
            return 0

    # Any signal that this is meant to be a multi-host run. Covers the
    # explicit kwarg, the coordinator env vars, and the cluster signals
    # jax's auto-detection reads (SLURM, TPU pods, megascale) — a pod whose
    # only intent signal is one of these must NOT silently degrade to N
    # independent single-host trainings. Auto-detected cloud metadata
    # (GCE metadata server) can't be probed from here, so such a pod still
    # needs initialize_multihost() called before any backend touch (the
    # CLI does).
    multihost_intent = bool(
        kwargs.get("coordinator_address")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or _int(os.environ.get("SLURM_JOB_NUM_NODES")) > 1
        or _int(os.environ.get("SLURM_NNODES")) > 1
        or len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
        or _int(os.environ.get("MEGASCALE_NUM_SLICES")) > 1
    )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # process group already up
        if "before" in str(e).lower() and not multihost_intent:
            # backends already initialized in a single-process context
            # (tests, notebooks): harmless. With a configured coordinator
            # this ordering bug would silently drop multi-host — raise.
            # Belt-and-braces for clusters whose only signal is metadata
            # auto-detection: if the already-up backends somehow DO span
            # processes, the swallow would be wrong — shout.
            if jax.process_count() > 1:
                import logging

                logging.getLogger("imm_tpu").warning(
                    "jax.distributed.initialize arrived after backend init "
                    "in a %d-process job — multi-host setup may be "
                    "incomplete; call initialize_multihost() first",
                    jax.process_count(),
                )
            return
        raise
    except ValueError:
        if multihost_intent:
            # a coordinator IS configured but initialize couldn't assemble
            # the process group (e.g. num_processes undetectable): silently
            # training N independent single-host models would be the worst
            # outcome, so surface it.
            raise
        # no coordinator configured anywhere: single process
        pass


def process_shard_spec() -> tuple[int, int] | None:
    """(process_index, process_count) for dataset sharding; None if single.

    Datasets slice their file/sequence lists as ``items[index::count]`` —
    interleaved, so sorted-by-subject orderings (e.g. H36M sequences) spread
    evenly across hosts instead of giving each host one subject block.
    """
    p = jax.process_count()
    return (jax.process_index(), p) if p > 1 else None


def shard_items(items, shard: tuple[int, int] | None):
    """Apply a (index, count) shard spec to a list (identity when None)."""
    if shard is None:
        return items
    index, count = shard
    if not 0 <= index < count:
        raise ValueError(f"bad shard spec: index {index} of {count}")
    return items[index::count]
