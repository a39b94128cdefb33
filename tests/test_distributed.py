"""Multi-host sharding wiring (imm_tpu.parallel.distributed).

Multi-host execution is untestable on one machine; what IS testable — and
tested here — is the shard arithmetic, the dataset-level slicing, and that
the single-process path degenerates to the identity.
"""

import numpy as np
import pytest

from imm_tpu.parallel.distributed import (
    initialize_multihost,
    process_shard_spec,
    shard_items,
)


def test_shard_items_partition():
    """Shards are disjoint, cover everything, and are balanced within 1."""
    items = list(range(23))
    for count in (1, 2, 3, 8):
        shards = [shard_items(items, (i, count)) for i in range(count)]
        flat = sorted(x for s in shards for x in s)
        assert flat == items
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1


def test_shard_items_identity_and_validation():
    items = [1, 2, 3]
    assert shard_items(items, None) is items
    with pytest.raises(ValueError):
        shard_items(items, (3, 3))
    with pytest.raises(ValueError):
        shard_items(items, (-1, 2))


def test_process_shard_spec_single_process():
    """One process (this machine): no sharding requested."""
    assert process_shard_spec() is None


def test_initialize_multihost_is_safe_single_process():
    """No coordinator configured -> silently a no-op, twice."""
    initialize_multihost()
    initialize_multihost()


def test_two_process_training_identical_params(tmp_path):
    """A REAL 2-process jax.distributed group on localhost (VERDICT r2 #5):
    coordinator + 2 subprocesses x 4 virtual CPU devices, a global 8-device
    mesh, and >= 2 host-fed scan dispatches where each process feeds only its
    local half of the global batch — the make_array_from_process_local_data
    seam no single-process test can cross. Replicated params must come out
    bitwise-identical on both processes."""
    import socket
    import subprocess
    import sys

    from test_data import _make_celeba

    root = str(tmp_path / "celeba")
    _make_celeba(root, n=16)
    out = str(tmp_path / "out")
    import os

    os.makedirs(out)
    with socket.socket() as s:  # pick a free localhost port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        # don't inherit the parent suite's 8-device flag; the worker sets 4
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord, root, out],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outputs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    a = np.load(os.path.join(out, "params_p0.npz"))
    b = np.load(os.path.join(out, "params_p1.npz"))
    assert set(a.files) == set(b.files) and len(a.files) > 0
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])


def test_dataset_shard_slices_files(tmp_path):
    pytest.importorskip("cv2")
    from test_data import _make_celeba  # reuse the fixture builder

    from imm_tpu.data import CelebADataset

    root = str(tmp_path / "celeba")
    _make_celeba(root, n=8)
    ds = CelebADataset(root, image_size=16)
    files = ds._train_files()
    # sharded iterators each see only their slice, union covers all files
    seen = set()
    for i in range(2):
        it = ds.train_batches(2, seed=0, n_batches=2, shard=(i, 2))
        for b in it:
            assert b["image"].shape == (2, 16, 16, 3)
        seen.update(shard_items(files, (i, 2)))
    assert seen == set(files)
