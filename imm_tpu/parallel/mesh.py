"""Device mesh + sharding helpers: data parallelism over ICI.

Reference behavior (tomasjakab/imm — SURVEY.md §2 "Parallelism"): single
process, in-graph multi-GPU towers, explicit gradient averaging on device 0.

TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over the slice's chips.
The train step is an ordinary ``jax.jit`` program whose *batch* carries a
``P('data')`` sharding and whose *state* is replicated; XLA partitions the
program and inserts the gradient all-reduce as ICI collectives — there is no
hand-written tower/average-gradients code to maintain, and a v5e-8 slice vs a
single chip is purely a mesh-size change (SURVEY.md §7 step 5).

Multi-host would extend this with ``jax.distributed.initialize`` + per-host
data sharding; the mesh/sharding code below is already shaped for it (it uses
all visible devices, however many processes contribute them).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over (up to) all visible devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is not None:
        if n_data > len(devices):
            raise ValueError(
                f"requested {n_data} devices, only {len(devices)} visible"
            )
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh, scan_axis: bool = False) -> NamedSharding:
    """Batch axis split across the 'data' mesh axis.

    ``scan_axis=True``: the array is a ``(scan, batch, ...)`` super-batch
    (``steps_per_call > 1`` stacking, see ``train/steps.py``) — the *second*
    axis is the batch; the leading scan axis must stay unsharded, matching
    the shard_map ``in_specs=P(None, 'data')`` of the scan train step.
    """
    return NamedSharding(mesh, P(None, "data") if scan_axis else P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
