"""Multi-host initialization (SURVEY.md §2/§5 comm-backend plan).

A single v5e-8 slice is one host — the target configuration needs none of
this. For multi-host slices/pods the recipe is:

    from imm_tpu.parallel.distributed import initialize_multihost
    initialize_multihost()        # before any jax.devices() call
    mesh = make_mesh()            # global mesh over all processes' chips

and the host data pipeline shards per-process via ``process_shard`` so each
host only loads/decodes its slice of the global batch. Collectives then ride
ICI within the slice and DCN across slices — XLA's partitioner decides, no
NCCL/MPI-style code exists anywhere in this framework.

Untestable on this machine (single host, single chip); kept minimal and
documented rather than speculative.
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
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # process group already up
        raise
    except ValueError:
        # no coordinator configured in the environment: single process
        pass


def process_shard(n: int) -> tuple[int, int]:
    """(start, stop) of this host's slice of a length-n global list."""
    p, i = jax.process_count(), jax.process_index()
    per = -(-n // p)
    return i * per, min((i + 1) * per, n)
