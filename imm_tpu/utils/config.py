"""Experiment configuration: dataclasses + YAML round-trip.

Reference behavior (SURVEY.md §1 L6): the reference merges a *paths* YAML
with an *experiment* YAML plus CLI flag overrides. Here the single source of
truth is typed dataclasses (jit-hashable, IDE-checkable); YAML files load
into and dump from them for parity with the reference workflow, and CLI
overrides apply as dotted ``key=value`` pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from imm_tpu.data.pairs import PairConfig
from imm_tpu.losses.perceptual import PerceptualLossConfig
from imm_tpu.models.imm import IMMConfig
from imm_tpu.train.state import TrainConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Which data feeds training/eval."""

    source: str = "synthetic"  # 'synthetic' | 'celeba' | 'aflw' | 'cats' | 'human36m'
    root: str = ""  # dataset root for file-backed sources
    pair_mode: str = "tps"  # 'tps' | 'temporal'
    # Host-side decode/batch pipeline for file-backed sources:
    # 'threaded' (default, dependency-light) | 'tfdata' (tf.data parallel
    # decode — tps pair mode only; see imm_tpu.data.tfdata).
    host_pipeline: str = "threaded"
    eval_norm: str = "iod"  # 'iod' | 'size'
    iod_points: tuple[int, int] = (0, 1)
    # Synthetic temporal mode only: pose correlation between the two frames
    # of a pair (SyntheticBlobFaces.pair_pose_gap). 0 = independent poses
    # (the default, matching all pre-round-4 runs); smaller g>0 = temporally
    # closer frames. The synthetic analog of the H36M frame-gap Δ.
    temporal_pose_gap: float = 0.0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    model: IMMConfig = IMMConfig()
    train: TrainConfig = TrainConfig()
    pair: PairConfig = PairConfig()
    loss: PerceptualLossConfig = PerceptualLossConfig()
    data: DataConfig = DataConfig()
    workdir: str = ""
    eval_every: int = 0
    eval_samples: int = 1024
    # abort (for supervisor restart + checkpoint resume) if no step completes
    # in this many seconds; 0 disables. See train/loop.py failure detection.
    stall_timeout_s: float = 0.0


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)
        }
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def _from_dict(cls, data: dict) -> Any:
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        if isinstance(value, dict):
            # nested dataclass (annotations are strings under
            # `from __future__ import annotations`, so resolve via the table)
            kwargs[key] = _from_dict(_FIELD_TYPES[(cls.__name__, key)], value)
        elif isinstance(value, list):
            kwargs[key] = tuple(
                tuple(v) if isinstance(v, list) else v for v in value
            )
        else:
            kwargs[key] = value
    return cls(**kwargs)


_FIELD_TYPES = {
    ("ExperimentConfig", "model"): IMMConfig,
    ("ExperimentConfig", "train"): TrainConfig,
    ("ExperimentConfig", "pair"): PairConfig,
    ("ExperimentConfig", "loss"): PerceptualLossConfig,
    ("ExperimentConfig", "data"): DataConfig,
}


def save_config(config: ExperimentConfig, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(config), f, sort_keys=False)


def load_config(path: str) -> ExperimentConfig:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return _from_dict(ExperimentConfig, data)


def apply_overrides(config: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply reference-style CLI overrides: ``model.n_landmarks=30`` etc."""
    data = _to_dict(config)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        import yaml

        value = yaml.safe_load(raw)
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config key: {key}")
        node[parts[-1]] = value
    return _from_dict(ExperimentConfig, data)
