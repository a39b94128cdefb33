"""Config system: YAML round-trip, overrides, preset integrity."""

import dataclasses

import pytest

from imm_tpu.configs import PRESETS, get_preset
from imm_tpu.utils.config import (
    ExperimentConfig,
    apply_overrides,
    load_config,
    save_config,
)


def test_yaml_roundtrip(tmp_path):
    cfg = get_preset("celeba_k10")
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded == cfg


def test_overrides():
    cfg = get_preset("celeba_k10")
    out = apply_overrides(
        cfg, ["model.n_landmarks=30", "train.batch_size=128", "data.root=/data/x"]
    )
    assert out.model.n_landmarks == 30
    assert out.train.batch_size == 128
    assert out.data.root == "/data/x"
    # untouched fields preserved
    assert out.model.image_size == cfg.model.image_size


def test_override_unknown_key_raises():
    cfg = get_preset("celeba_k10")
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["model.bogus=1"])


def test_all_presets_are_buildable_configs():
    for name, cfg in PRESETS.items():
        assert isinstance(cfg, ExperimentConfig)
        # model geometry must be internally consistent (IMMConfig validates)
        assert cfg.model.bottleneck_hw[0] > 0
        # loss weight count covers the term count for its source
        if cfg.loss.feature_source == "pixel":
            assert len(cfg.loss.weights) >= cfg.loss.pixel_scales
        else:
            assert len(cfg.loss.weights) >= 1 + len(cfg.loss.taps)


def test_unknown_preset():
    with pytest.raises(KeyError):
        get_preset("nope")


def test_driver_configs_covered():
    """The five BASELINE.json configs each map to a preset."""
    assert {"celeba_k10", "aflw_k30", "cats_k20", "human36m", "swap"} <= set(PRESETS)
    assert PRESETS["synthetic_best_k30"].model.n_landmarks == 30
    assert PRESETS["synthetic_best_k30"].train.equi_weight == 1.0
    assert PRESETS["synthetic_best_k30"].loss.feature_source == "trained"
    # round-5 structure lever: K=10 ships ent_weight=0.03 (within-sigma
    # %IOD, fixes collapse/idle channels), but it must NOT leak into the
    # K=30 derivative where the same dose probed strongly negative
    # (docs/artifacts/sweep_tps.md round-5 K=30 ent section).
    assert PRESETS["synthetic_best"].train.ent_weight == 0.03
    assert PRESETS["synthetic_best_k30"].train.ent_weight == 0.0
    assert PRESETS["aflw_k30"].model.n_landmarks == 30
    assert PRESETS["cats_k20"].model.n_landmarks == 20
    assert PRESETS["human36m"].data.pair_mode == "temporal"
    assert PRESETS["human36m"].pair.enable_warp is False
    assert PRESETS["human36m"].data.eval_norm == "size"

# The sweep-variant registry checks moved to tests/test_sweep_variants.py
# when the variants became data (scripts/sweep_variants.yaml).
