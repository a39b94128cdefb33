"""Optional tf.data host pipeline (parity with the reference's input stack).

The reference's L1 layer is a ``tf.data`` pipeline (SURVEY.md §1); the default
pipeline here is the dependency-light threaded loader in ``datasets.py``. This
module provides an equivalent ``tf.data``-backed feed for deployments where
TF's parallel JPEG decode and prefetching are preferred — same contract
(numpy batches of decoded/cropped/resized frames), TPS/jitter still on device.
Selectable in production with ``data.host_pipeline='tfdata'`` (tps pair mode;
temporal pair sampling stays on the threaded loader).

TF is used CPU-only as a data library; nothing here touches the TPU.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np


def tfdata_batches(
    files: list[str],
    image_size: int,
    batch_size: int,
    seed: int = 0,
    shuffle_buffer: int = 4096,
    num_parallel: int = 8,
    crop: tuple[int, int, int, int] | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Infinite {'image': (B, S, S, 3) float32 [0,1]} stream via tf.data.

    ``crop``: optional (y0, x0, h, w) pre-crop applied before the center
    square, matching ``datasets._load_image`` (e.g. CelebA's face box).
    """
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")  # CPU data pipeline only

    def decode(path):
        raw = tf.io.read_file(path)
        img = tf.io.decode_image(raw, channels=3, expand_animations=False)
        if crop is not None:
            cy, cx, ch, cw = crop
            img = tf.image.crop_to_bounding_box(img, cy, cx, ch, cw)
        shape = tf.shape(img)
        side = tf.minimum(shape[0], shape[1])
        y0 = (shape[0] - side) // 2
        x0 = (shape[1] - side) // 2
        img = tf.image.crop_to_bounding_box(img, y0, x0, side, side)
        img = tf.image.resize(img, (image_size, image_size), method="bilinear")
        return tf.cast(img, tf.float32) / 255.0

    ds = (
        tf.data.Dataset.from_tensor_slices(list(files))
        .shuffle(min(shuffle_buffer, len(files)), seed=seed, reshuffle_each_iteration=True)
        .repeat()
        .map(decode, num_parallel_calls=num_parallel)
        .batch(batch_size, drop_remainder=True)
        .prefetch(tf.data.AUTOTUNE)
    )
    for batch in ds.as_numpy_iterator():
        yield {"image": batch}
