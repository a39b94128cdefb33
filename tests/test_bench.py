"""Serving-benchmark smoke: bench.bench_inference on the tiny CPU model.

Guards the bench contract (record keys, single-device rates) so the
round-end driver invocation can't be broken by a refactor; the real-TPU
numbers come from ``python bench.py --mode inference`` on the chip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402

from tests.common import TINY  # noqa: E402


def test_bench_train_smoke():
    from imm_tpu.losses import PerceptualLossConfig

    rec = bench.bench_train(
        batch=4, scan=2,
        loss_cfg=PerceptualLossConfig(feature_source="pixel", weights=(1, 1, 1)),
        cfg=TINY,
    )
    assert rec["metric"] == "train_images_per_sec_per_chip"
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert rec["batch"] == 4 and rec["scan"] == 2
    # both utilization denominators ship whenever XLA cost analysis worked
    if "tflops" in rec:
        assert rec["pct_of_nominal_peak"] <= rec["pct_of_measured_peak"]
        assert rec["nominal_peak_tflops_assumed"] == bench.NOMINAL_PEAK_TFLOPS


def test_bench_inference_smoke():
    rec = bench.bench_inference(4, cfg=TINY)
    assert rec["metric"] == "landmark_images_per_sec_per_chip"
    assert rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] is None  # reference has no serving baseline
    assert rec["batch"] == 4
    assert rec["value"] > 0
    assert rec["latency_ms_batch1"] > 0
    assert rec["swap_images_per_sec_per_chip"] > 0
