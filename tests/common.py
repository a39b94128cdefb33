"""Shared test fixtures: the tiny CPU model config used across suites."""

from imm_tpu.models import IMMConfig

TINY = IMMConfig(
    image_size=32,
    n_landmarks=4,
    filters=(8, 8, 16, 16),
    strides=(1, 2, 1, 2),
    decoder_filters=(16, 8, 8),
    norm="batch",
)
