"""Subprocess worker for the real 2-process jax.distributed test.

Launched by ``test_distributed.test_two_process_training_identical_params``
(VERDICT r2 next-round #5): each worker joins a localhost process group,
contributes 4 virtual CPU devices to a global 8-device mesh, trains a tiny
file-backed experiment for >= 2 host-fed scan dispatches — crossing the
``make_array_from_process_local_data`` seam with genuinely process-local
shards (experiment.py) — and dumps its final params for the parent to
compare bitwise across processes.

Not a pytest module (underscore prefix): run as
``python tests/_distributed_worker.py <pid> <nproc> <coord> <root> <out>``.
"""

from __future__ import annotations

import os
import sys


def main(argv):
    process_id, num_processes = int(argv[1]), int(argv[2])
    coordinator, data_root, out_dir = argv[3], argv[4], argv[5]

    # 4 virtual CPU devices per process -> 8 global. Must be set before any
    # backend initializes; the platform must also be forced via jax.config
    # because this machine's sitecustomize imports jax (registering the axon
    # TPU plugin) before main() runs.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from imm_tpu.parallel.distributed import initialize_multihost

    # The seam under test requires this to run before any backend touch.
    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())

    import dataclasses

    import numpy as np

    from imm_tpu.configs import get_preset
    from imm_tpu.experiment import build_experiment
    from imm_tpu.utils.config import DataConfig

    base = get_preset("tiny_cpu")
    cfg = dataclasses.replace(
        base,
        # batch 8 over 2 processes -> each host feeds 4 samples/step from its
        # own interleaved half of the file list; scan=2 stacks super-batches.
        train=dataclasses.replace(base.train, batch_size=8, steps_per_call=2),
        data=DataConfig(source="celeba", root=data_root, pair_mode="tps"),
    )
    exp = build_experiment(cfg, total_steps=4)  # 2 scan dispatches
    assert exp.mesh.size == 4 * num_processes
    state = exp.run()
    assert int(np.asarray(state.step.addressable_shards[0].data)) == 4

    # Params are replicated; read this process's local copy and dump it.
    flat, _ = jax.tree.flatten(
        jax.tree.map(
            lambda x: np.asarray(x.addressable_shards[0].data), state.params
        )
    )
    np.savez(
        os.path.join(out_dir, f"params_p{process_id}.npz"),
        **{f"a{i}": leaf for i, leaf in enumerate(flat)},
    )
    jax.distributed.shutdown()
    print(f"worker {process_id} ok", flush=True)


if __name__ == "__main__":
    main(sys.argv)
