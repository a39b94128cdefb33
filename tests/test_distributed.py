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
