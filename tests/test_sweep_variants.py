"""Registry validation for scripts/sweep_variants.yaml (VERDICT r3 #7).

Every variant must apply cleanly to the synthetic preset, and any step
budget a variant's NAME encodes must be baked in the registry so a bare
``--only`` invocation can't train the wrong schedule and then shadow the
correct run in the resume-skip set (ADVICE r3).
"""

import os
import re
import sys

import pytest

scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, scripts_dir)
try:
    import sweep_tps
finally:
    sys.path.remove(scripts_dir)

from imm_tpu.configs import get_preset  # noqa: E402
from imm_tpu.utils.config import apply_overrides  # noqa: E402


def test_every_variant_parses_into_experiment_config():
    for name, variant in sweep_tps.VARIANTS.items():
        config = apply_overrides(
            get_preset("synthetic"), [f"name={name}"] + list(variant.overrides)
        )
        assert config.name == name
        assert len(config.pair.rotsd) == 2


def test_named_budgets_are_baked():
    """A ``*_NNk`` name must carry steps=NN*1000 in the registry; variants
    without a named budget must not bake one (they take --steps)."""
    for name, variant in sweep_tps.VARIANTS.items():
        budget = re.search(r"_(\d+)k$", name)
        if budget:
            assert variant.steps == int(budget.group(1)) * 1000, name
        else:
            assert variant.steps is None, name
    # the convergence finals the verdict tracks are present with budgets
    assert sweep_tps.VARIANTS[
        "final_ind_2x_k10_noisefeat_equi2_ema_60k"
    ].steps == 60_000
    assert sweep_tps.VARIANTS[
        "final_ind_3x_k30_noisefeat_equi1_ema_60k"
    ].steps == 60_000


def test_budget_name_mismatch_rejected(tmp_path):
    bad = tmp_path / "variants.yaml"
    bad.write_text("probe_40k:\n  steps: 15000\n  overrides: []\n")
    with pytest.raises(ValueError, match="40k budget"):
        sweep_tps.load_variants(str(bad))


def test_default_variants_filter():
    """default-sweep filter: probes run (including temporal-mode ones, which
    a name-prefix filter once silently excluded); convergence runs (baked
    budgets / LR-decay boundaries) and trained-feature A/Bs don't."""
    defaults = sweep_tps.default_variants()
    assert "temporal_k30_equi1" in defaults
    assert "ind_2x" in defaults
    for name in defaults:
        v = sweep_tps.VARIANTS[name]
        assert v.steps is None
        assert not any(o.startswith("train.lr_boundaries") for o in v.overrides)
        assert not any("trained_weights" in o for o in v.overrides)
    assert "final_ind_2x_noisefeat_equi_60k" not in defaults
    assert "temporal_k30_noisefeat_equi_35k" not in defaults


def test_recorded_reread_and_chip_lock(tmp_path):
    """Concurrent-runner safety: done-set re-read + advisory chip lock.

    Round-4 postmortem: two queues launched minutes apart both trained
    temporal_k30_noisefeat because each read the done-set once at startup.
    The runner now re-reads under a per-variant flock."""
    import json
    import multiprocessing

    out = tmp_path / "sweep.jsonl"
    assert sweep_tps._recorded(str(out)) == set()
    out.write_text(json.dumps({"variant": "a", "steps": 15000}) + "\n")
    assert sweep_tps._recorded(str(out)) == {("a", 15000)}
    # a second record appended by "another runner" is visible on re-read
    with open(out, "a") as f:
        f.write(json.dumps({"variant": "a", "steps": 60000}) + "\n")
    assert sweep_tps._recorded(str(out)) == {("a", 15000), ("a", 60000)}

    # the lock excludes a second holder while held, admits it after release
    lock = str(tmp_path / "chip.lock")

    def try_hold(path, q):
        import fcntl
        with open(path, "a+") as f:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                q.put("acquired")
                fcntl.flock(f, fcntl.LOCK_UN)
            except OSError:
                q.put("blocked")

    ctx = multiprocessing.get_context("fork")
    q = ctx.Queue()
    with sweep_tps._chip_lock(lock):
        p = ctx.Process(target=try_hold, args=(lock, q))
        p.start(); p.join(10)
        assert q.get(timeout=10) == "blocked"
    p = ctx.Process(target=try_hold, args=(lock, q))
    p.start(); p.join(10)
    assert q.get(timeout=10) == "acquired"

    # empty path disables locking entirely (CPU smoke tests)
    with sweep_tps._chip_lock(""):
        pass


def test_summarize_sweep_never_touches_curated_docs(tmp_path):
    """The renderer writes <stem>_table.md + curve files ONLY — an earlier
    version rewrote the hand-curated sweep_tps.md wholesale."""
    import json

    sys.path.insert(0, scripts_dir)
    try:
        import summarize_sweep
    finally:
        sys.path.remove(scripts_dir)

    curated = tmp_path / "sweep_tps.md"
    curated.write_text("# hand-written analysis — must survive\n")
    rec = {
        "variant": "final_demo_60k",
        "steps": 60000,
        "overrides": ["train.equi_weight=1.0"],
        "final": {
            "landmark_error_test_pct": 2.0,
            "landmark_error_train_pct": 1.9,
            "landmark_error_test_pct_ema": 2.1,
        },
        "curve": [{
            "step": 3000,
            "eval/landmark_error_test_pct": 5.0,
            "eval/landmark_error_train_pct": 4.9,
        }],
    }
    inp = tmp_path / "final_runs.jsonl"
    inp.write_text(json.dumps(rec) + "\n")
    summarize_sweep.main(["--inp", str(inp)])

    assert curated.read_text() == "# hand-written analysis — must survive\n"
    table = (tmp_path / "final_runs_table.md").read_text()
    assert "final_demo_60k" in table and "2.10" in table  # EMA column present
    # finals keep the un-prefixed historical curve name
    assert (tmp_path / "eval_curve_final_demo_60k.txt").exists()
    assert not (tmp_path / "eval_curve_sweep_final_demo_60k.txt").exists()
