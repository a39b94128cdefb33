"""File-backed dataset loaders: CelebA/MAFL, AFLW, cat-heads, Human3.6M.

Reference behavior (tomasjakab/imm ``imm/datasets/*.py`` — mount empty at
build time, per SURVEY.md §2): per-dataset classes decode, crop and resize
frames and expose a source/target pair stream; annotated splits feed the
landmark-regression eval. The five driver configs map onto these four loaders
plus the synthetic harness.

TPU-first split: the host side here ONLY lists files, decodes (OpenCV),
crops, resizes and batches — a threaded double-buffered prefetcher keeps the
feed ahead of the device. All pair synthesis (TPS warps, jitter) happens on
device (``imm_tpu.data.pairs``); video datasets yield (frame_a, frame_b)
temporal pairs directly from the frame index.

No datasets ship on this machine, so every loader is exercised in tests
against tiny fabricated fixtures in the same on-disk formats as the public
distributions (annotation text files, ``.cat`` files, frame directories).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from collections.abc import Iterator

import numpy as np

try:  # cv2 is the decode path; PIL-free and fast.
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """What the trainer needs to know about a dataset."""

    name: str
    image_size: int
    n_landmarks: int  # unsupervised K (model config)
    n_annotated: int  # annotated points used by the regression eval
    pair_mode: str  # 'tps' (static images) or 'temporal' (video)


def _load_image_with_hw(
    path: str, image_size: int, crop: tuple[int, int, int, int] | None
) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode -> optional (y0, x0, h, w) crop -> center square -> resize.

    Returns (image in [0,1], original (H, W) before any cropping) from a
    SINGLE decode — eval needs the original size for landmark normalization.
    """
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("OpenCV is required for file-backed datasets")
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"could not decode image: {path}")
    orig_hw = img.shape[:2]
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if crop is not None:
        y0, x0, ch, cw = crop
        img = img[y0 : y0 + ch, x0 : x0 + cw]
    h, w = img.shape[:2]
    side = min(h, w)
    y0, x0 = (h - side) // 2, (w - side) // 2
    img = img[y0 : y0 + side, x0 : x0 + side]
    img = cv2.resize(img, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32) / 255.0, orig_hw


def _load_image(path: str, image_size: int, crop: tuple[int, int, int, int] | None):
    return _load_image_with_hw(path, image_size, crop)[0]


def _normalize_landmarks_xy(
    pts_xy: np.ndarray,
    orig_hw: tuple[int, int],
    crop: tuple[int, int, int, int] | None,
) -> np.ndarray:
    """Pixel (x, y) annotations -> normalized (y, x) in [-1, 1].

    Accounts for the same crop + center-square chain as ``_load_image`` (the
    final resize is scale-invariant in normalized coordinates).
    """
    pts = pts_xy.astype(np.float64).copy()
    h, w = orig_hw
    if crop is not None:
        cy, cx, ch, cw = crop
        pts[:, 0] -= cx
        pts[:, 1] -= cy
        h, w = ch, cw
    side = min(h, w)
    y0, x0 = (h - side) // 2, (w - side) // 2
    pts[:, 0] -= x0
    pts[:, 1] -= y0
    x_n = pts[:, 0] / (side - 1) * 2.0 - 1.0
    y_n = pts[:, 1] / (side - 1) * 2.0 - 1.0
    return np.stack([y_n, x_n], axis=-1).astype(np.float32)


_STOP = object()  # end-of-stream sentinel for prefetch_iterator


def prefetch_iterator(it, depth: int = 2):
    """Run iterator ``it`` on a background thread, keeping ``depth`` items hot.

    Used to overlap host-side super-batch assembly and the host->device
    transfer with device compute (the device_put side of the double-buffered
    pipeline; decode-side prefetch is ``_PrefetchIterator``). Exceptions in
    the source iterator propagate to the consumer; exhaustion ends the
    stream. ``jax.device_put``/``make_array_from_process_local_data`` are
    thread-safe, so the producer may build global arrays.

    Pass a FINITE ``it`` (e.g. ``itertools.islice`` bounded to the number of
    batches the consumer will pull) so the producer thread terminates and
    its buffered device arrays are released; with an infinite source the
    daemon thread stays blocked on a full queue for the process lifetime.
    The thread starts lazily on the first pull, so merely building a
    pipeline (e.g. an eval-only experiment that never trains) does no work.

    The queue reserves one extra slot beyond ``depth`` so the end-of-stream
    sentinel always fits: if the consumer stops pulling with exactly
    ``depth`` items left (e.g. a bounded source whose last batches go
    unconsumed), the producer can still flush ``_STOP`` and exit instead of
    pinning its buffered device arrays for the process lifetime.
    """
    q: queue.Queue = queue.Queue(maxsize=depth + 1)

    def _run():
        try:
            for item in it:
                q.put(item)
            q.put(_STOP)
        except Exception as e:  # surface producer failures to the consumer
            q.put(e)

    def _gen():
        threading.Thread(target=_run, daemon=True).start()
        while True:
            item = q.get()
            if item is _STOP:
                return
            if isinstance(item, Exception):
                raise RuntimeError("prefetch producer failed") from item
            yield item

    return _gen()


class _PrefetchIterator:
    """Background-thread batch producer (double-buffered host pipeline)."""

    def __init__(self, make_batch, n_batches: int | None, prefetch: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._n = n_batches
        self._thread = threading.Thread(
            target=self._run, args=(make_batch,), daemon=True
        )
        self._thread.start()

    def _run(self, make_batch):
        i = 0
        try:
            while self._n is None or i < self._n:
                self._q.put(make_batch(i))
                i += 1
            self._q.put(None)
        except BaseException as e:  # surface producer failures to the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise RuntimeError("data pipeline producer failed") from item
        return item


class ImageDataset:
    """Base: a list of (image path, annotation) + batching/prefetch."""

    spec: DatasetSpec

    def __init__(self, root: str, image_size: int = 128):
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"dataset root not found: {root} — real datasets do not ship "
                "with this machine; use SyntheticBlobFaces or point at data"
            )
        self.root = root
        self.image_size = image_size

    # subclasses implement:
    def _train_files(self) -> list[str]:
        raise NotImplementedError

    def _eval_records(self, split: str) -> list[tuple[str, np.ndarray]]:
        """-> [(path, landmarks_xy_pixels)] for an annotated split."""
        raise NotImplementedError

    def _crop(self) -> tuple[int, int, int, int] | None:
        return None

    def train_batches(
        self,
        batch_size: int,
        seed: int = 0,
        n_batches: int | None = None,
        shard: tuple[int, int] | None = None,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Infinite (or bounded) stream of {'image': (B, S, S, 3)} batches.

        ``shard=(process_index, process_count)`` restricts this iterator to an
        interleaved slice of the file list — the multi-host path where each
        host feeds only its local share of the global batch (see
        ``imm_tpu.parallel.distributed``).
        """
        from imm_tpu.parallel.distributed import shard_items

        files = shard_items(self._train_files(), shard)
        if not files:
            raise RuntimeError(f"no training images under {self.root}")
        rng = np.random.default_rng(seed)
        crop = self._crop()
        # epoch cursor: reshuffle whenever fewer than a batch remains, so
        # every epoch sees a fresh order and no sample is skipped/duplicated
        state = {"order": rng.permutation(len(files)), "pos": 0}

        def make_batch(_):
            if state["pos"] + batch_size > len(files):
                state["order"] = rng.permutation(len(files))
                state["pos"] = 0
            idx = state["order"][state["pos"] : state["pos"] + batch_size]
            state["pos"] += batch_size
            imgs = np.stack(
                [_load_image(files[j], self.image_size, crop) for j in idx]
            )
            return {"image": imgs}

        return _PrefetchIterator(make_batch, n_batches)

    def tfdata_batches(
        self,
        batch_size: int,
        seed: int = 0,
        shard: tuple[int, int] | None = None,
    ) -> Iterator[dict[str, np.ndarray]]:
        """tf.data-backed equivalent of :meth:`train_batches` (same contract:
        infinite {'image': (B, S, S, 3)} stream, same crop semantics, same
        interleaved multi-host sharding). Selected by
        ``data.host_pipeline='tfdata'``; the pipeline choice lives here so
        both feeds share one source of truth for files and cropping."""
        from imm_tpu.data.tfdata import tfdata_batches
        from imm_tpu.parallel.distributed import shard_items

        files = shard_items(self._train_files(), shard)
        if not files:
            raise RuntimeError(f"no training images under {self.root}")
        return tfdata_batches(
            files,
            image_size=self.image_size,
            batch_size=batch_size,
            seed=seed,
            crop=self._crop(),
        )

    def eval_arrays(self, split: str) -> dict[str, np.ndarray]:
        """Annotated split as arrays: image (N,S,S,3), landmarks (N,L,2) (y,x)."""
        records = self._eval_records(split)
        crop = self._crop()
        images, landmarks = [], []
        for path, pts_xy in records:
            img, orig_hw = _load_image_with_hw(path, self.image_size, crop)
            images.append(img)
            landmarks.append(_normalize_landmarks_xy(pts_xy, orig_hw, crop))
        return {
            "image": np.stack(images),
            "landmarks": np.stack(landmarks),
        }


class CelebADataset(ImageDataset):
    """Aligned CelebA with MAFL train/test splits (driver config 1).

    Expected layout (public distribution):
      root/Img/img_align_celeba/*.jpg        (178x218 aligned crops)
      root/Anno/list_landmarks_align_celeba.txt   (5 points: eyes, nose, mouth)
      root/MAFL/training.txt, root/MAFL/testing.txt (file lists)
    """

    def __init__(self, root: str, image_size: int = 128, n_landmarks: int = 10):
        super().__init__(root, image_size)
        self.spec = DatasetSpec("celeba", image_size, n_landmarks, 5, "tps")
        self._img_dir = os.path.join(root, "Img", "img_align_celeba")
        self._landmarks = self._read_landmark_file(
            os.path.join(root, "Anno", "list_landmarks_align_celeba.txt")
        )
        self._mafl = {
            "train": self._read_list(os.path.join(root, "MAFL", "training.txt")),
            "test": self._read_list(os.path.join(root, "MAFL", "testing.txt")),
        }

    @staticmethod
    def _read_list(path):
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    @staticmethod
    def _read_landmark_file(path):
        out = {}
        with open(path) as f:
            lines = f.read().splitlines()
        for ln in lines[2:]:  # line 0 = count, line 1 = header
            parts = ln.split()
            if len(parts) == 11:
                out[parts[0]] = np.array(
                    [float(v) for v in parts[1:]], np.float32
                ).reshape(5, 2)
        return out

    def _train_files(self):
        mafl_test = set(self._mafl["test"])
        return [
            os.path.join(self._img_dir, f)
            for f in sorted(os.listdir(self._img_dir))
            if f.endswith(".jpg") and f not in mafl_test
        ]

    def _eval_records(self, split):
        return [
            (os.path.join(self._img_dir, name), self._landmarks[name])
            for name in self._mafl[split]
            if name in self._landmarks
        ]


class AFLWDataset(ImageDataset):
    """AFLW faces, 5 annotated points (driver config 2; K=30 unsupervised).

    Expected layout: root/images/*.jpg and root/aflw_{split}.csv with rows
    ``filename,x1,y1,...,x5,y5`` (plus optional header).
    """

    def __init__(self, root: str, image_size: int = 128, n_landmarks: int = 30):
        super().__init__(root, image_size)
        self.spec = DatasetSpec("aflw", image_size, n_landmarks, 5, "tps")
        self._img_dir = os.path.join(root, "images")

    def _read_csv(self, split):
        path = os.path.join(self.root, f"aflw_{split}.csv")
        recs = []
        with open(path) as f:
            for ln in f:
                parts = ln.strip().split(",")
                if len(parts) != 11:
                    continue
                try:  # robust header/junk-row skip: parse, don't pattern-match
                    vals = [float(v) for v in parts[1:]]
                except ValueError:
                    continue
                pts = np.array(vals, np.float32).reshape(5, 2)
                if not np.isfinite(pts).all():
                    continue  # 'nan'/'inf' placeholders would poison eval
                recs.append((parts[0], pts))
        return recs

    def _train_files(self):
        return [
            os.path.join(self._img_dir, f)
            for f in sorted(os.listdir(self._img_dir))
            if f.lower().endswith((".jpg", ".png"))
        ]

    def _eval_records(self, split):
        return [
            (os.path.join(self._img_dir, name), pts)
            for name, pts in self._read_csv(split)
            if os.path.exists(os.path.join(self._img_dir, name))
        ]


class CatHeadsDataset(ImageDataset):
    """Cat-heads (driver config 3; K=20). Public '.cat' annotation format:
    ``<count> x1 y1 x2 y2 ...`` with 9 points (eyes, mouth, 6 ear points);
    the eval uses the first 3 (eyes + mouth) by default.
    """

    def __init__(
        self, root: str, image_size: int = 128, n_landmarks: int = 20,
        eval_points: int = 9, train_fraction: float = 0.9,
    ):
        super().__init__(root, image_size)
        self.spec = DatasetSpec("cats", image_size, n_landmarks, eval_points, "tps")
        self.eval_points = eval_points
        self._records = self._scan()
        n_train = int(len(self._records) * train_fraction)
        self._splits = {
            "train": self._records[:n_train],
            "test": self._records[n_train:],
        }

    def _scan(self):
        recs = []
        for dirpath, _, files in sorted(os.walk(self.root)):
            for f in sorted(files):
                if f.lower().endswith((".jpg", ".png")):
                    img_path = os.path.join(dirpath, f)
                    ann_path = img_path + ".cat"
                    recs.append((img_path, ann_path if os.path.exists(ann_path) else None))
        return recs

    def _train_files(self):
        return [p for p, _ in self._splits["train"]]

    def _eval_records(self, split):
        recs = []
        for img_path, ann_path in self._splits[split]:
            if ann_path is None:
                continue
            with open(ann_path) as f:
                vals = [float(v) for v in f.read().split()]
            n = int(vals[0])
            pts = np.array(vals[1 : 1 + 2 * n], np.float32).reshape(n, 2)
            recs.append((img_path, pts[: self.eval_points]))
        return recs


class Human36MDataset(ImageDataset):
    """Human3.6M video frames with temporal pair sampling (driver config 4).

    Expected layout: root/<split>/<sequence>/frame_*.jpg with an optional
    per-sequence ``landmarks.npy`` of shape (T, L, 2) in pixel (x, y).
    Training yields (frame_t, frame_{t+delta}) pairs from the same sequence —
    the reference's temporal source/target sampling; TPS is disabled.
    """

    def __init__(
        self, root: str, image_size: int = 128, n_landmarks: int = 16,
        max_gap: int = 30,
    ):
        super().__init__(root, image_size)
        self.spec = DatasetSpec("human36m", image_size, n_landmarks, 32, "temporal")
        self.max_gap = max_gap
        self._seqs = {
            split: self._scan_split(split) for split in ("train", "test")
            if os.path.isdir(os.path.join(root, split))
        }

    def _scan_split(self, split):
        seqs = []
        split_dir = os.path.join(self.root, split)
        for seq in sorted(os.listdir(split_dir)):
            seq_dir = os.path.join(split_dir, seq)
            if not os.path.isdir(seq_dir):
                continue
            frames = sorted(
                os.path.join(seq_dir, f)
                for f in os.listdir(seq_dir)
                if f.lower().endswith((".jpg", ".png"))
            )
            lm_path = os.path.join(seq_dir, "landmarks.npy")
            lms = np.load(lm_path) if os.path.exists(lm_path) else None
            if frames:
                seqs.append((frames, lms))
        return seqs

    def _train_files(self):
        return [f for frames, _ in self._seqs.get("train", []) for f in frames]

    def train_pair_batches(
        self,
        batch_size: int,
        seed: int = 0,
        n_batches: int | None = None,
        shard: tuple[int, int] | None = None,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Temporal pairs: {'image_a', 'image_b'} from the same sequence.

        ``shard``: see ``ImageDataset.train_batches`` — here it slices whole
        sequences, never splitting a sequence across hosts.
        """
        from imm_tpu.parallel.distributed import shard_items

        seqs = [s for s in self._seqs.get("train", []) if len(s[0]) >= 2]
        seqs = shard_items(seqs, shard)
        if not seqs:
            raise RuntimeError(f"no multi-frame sequences under {self.root}/train")
        rng = np.random.default_rng(seed)

        def make_batch(_):
            a_list, b_list = [], []
            for _ in range(batch_size):
                frames, _lm = seqs[rng.integers(len(seqs))]
                # draw t so at least one later frame exists, and the gap from
                # what actually fits — clamping u to the sequence end would
                # yield degenerate a == b pairs near sequence tails and
                # collapse the gap distribution there (ADVICE r1)
                t = int(rng.integers(len(frames) - 1))
                max_gap = min(self.max_gap, len(frames) - 1 - t)
                gap = int(rng.integers(1, max_gap + 1))
                u = t + gap
                a_list.append(_load_image(frames[t], self.image_size, None))
                b_list.append(_load_image(frames[u], self.image_size, None))
            return {"image_a": np.stack(a_list), "image_b": np.stack(b_list)}

        return _PrefetchIterator(make_batch, n_batches)

    def _eval_records(self, split):
        recs = []
        for frames, lms in self._seqs.get(split, []):
            if lms is None:
                continue
            for i, path in enumerate(frames):
                recs.append((path, lms[i].astype(np.float32)))
        return recs


_DATASETS = {
    "celeba": CelebADataset,
    "aflw": AFLWDataset,
    "cats": CatHeadsDataset,
    "human36m": Human36MDataset,
}


def get_dataset(name: str, root: str, **kwargs) -> ImageDataset:
    """Factory mirroring the reference's dataset registry."""
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; options: {sorted(_DATASETS)}")
    return _DATASETS[name](root, **kwargs)
