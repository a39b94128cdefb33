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


def test_status_field_validated(tmp_path):
    """Registry status enforcement (VERDICT r4 #7): every entry carries a
    valid status; non-active entries need a reason doc pointer."""
    for name, v in sweep_tps.VARIANTS.items():
        assert v.status in sweep_tps.VALID_STATUSES, name
        if v.status != "active":
            assert v.reason, f"{name}: non-active without reason"
    # the refuted separation-hinge family is dead in the shipped registry
    for dead in ("ind_2x_k10_noisefeat_equi2_sep1",
                 "ind_2x_k10_noisefeat_equi2_sep10",
                 "ind_2x_k10_noisefeat_equi2_sep1m04"):
        assert sweep_tps.VARIANTS[dead].status == "refuted", dead

    bad = tmp_path / "variants.yaml"
    bad.write_text("probe:\n  status: dead\n  overrides: []\n")
    with pytest.raises(ValueError, match="unknown status"):
        sweep_tps.load_variants(str(bad))
    bad.write_text("probe:\n  status: refuted\n  overrides: []\n")
    with pytest.raises(ValueError, match="requires a `reason`"):
        sweep_tps.load_variants(str(bad))


def test_runner_refuses_refuted_without_force(capsys):
    """A --only list naming a refuted variant exits up front, in
    milliseconds, without touching the device (VERDICT r4 weak #3)."""
    with pytest.raises(SystemExit, match="refusing non-active"):
        sweep_tps.main(["--only", "ind_2x_k10_noisefeat_equi2_sep10",
                        "--lock-file", ""])


def test_seed_dimension(tmp_path):
    """Seeds are distinct run units: registry parsing, per-seed workdirs
    (seed 0 keeps the historical hash), per-seed skip keys (VERDICT r4 #2)."""
    import json

    reg = tmp_path / "variants.yaml"
    reg.write_text("probe:\n  overrides: []\n  seeds: [0, 1, 2]\n")
    v = sweep_tps.load_variants(str(reg))["probe"]
    assert v.seeds == (0, 1, 2)
    reg.write_text("probe:\n  overrides: []\n  seeds: [1, 1]\n")
    with pytest.raises(ValueError, match="distinct ints"):
        sweep_tps.load_variants(str(reg))

    any_name = "ind_2x"
    var = sweep_tps.VARIANTS[any_name]
    w0 = sweep_tps.variant_workdir(any_name, var, 15000, seed=0)
    assert w0 == sweep_tps.variant_workdir(any_name, var, 15000)  # historical
    assert w0 != sweep_tps.variant_workdir(any_name, var, 15000, seed=1)
    cfg = sweep_tps.variant_config(any_name, var, 15000, seed=7)
    assert cfg.train.seed == 7

    out = tmp_path / "sweep.jsonl"
    out.write_text(
        json.dumps({"variant": "a", "steps": 15000}) + "\n"  # pre-seed record
        + json.dumps({"variant": "a", "steps": 15000, "seed": 1}) + "\n"
    )
    assert sweep_tps._recorded(str(out)) == {("a", 15000, 0), ("a", 15000, 1)}


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
    assert sweep_tps._recorded(str(out)) == {("a", 15000, 0)}
    # a second record appended by "another runner" is visible on re-read
    with open(out, "a") as f:
        f.write(json.dumps({"variant": "a", "steps": 60000}) + "\n")
    assert sweep_tps._recorded(str(out)) == {("a", 15000, 0), ("a", 60000, 0)}

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


def test_summarize_seed_aggregates_and_kind_naming(tmp_path):
    """Round-5 summarize features: defensive sort on a null metric, explicit
    kind-driven curve naming (a probe named final_* must NOT clobber a
    final's curve — ADVICE r4), per-seed curve suffixes, mean±sd section."""
    import json

    sys.path.insert(0, scripts_dir)
    try:
        import summarize_sweep
    finally:
        sys.path.remove(scripts_dir)

    def rec(**kw):
        base = {
            "variant": "probe_x", "steps": 15000, "overrides": [],
            "final": {"landmark_error_test_pct": 3.0,
                      "landmark_error_train_pct": 2.9},
            "curve": [{"step": 3000,
                       "eval/landmark_error_test_pct": 5.0,
                       "eval/landmark_error_train_pct": 4.9}],
        }
        base.update(kw)
        return base

    records = [
        rec(seed=0, final={"landmark_error_test_pct": 3.0,
                           "landmark_error_train_pct": 2.9}),
        rec(seed=1, final={"landmark_error_test_pct": 3.4,
                           "landmark_error_train_pct": 3.3}),
        # a record with a null final metric must sort last, not crash
        rec(variant="broken", final={"landmark_error_test_pct": None,
                                     "landmark_error_train_pct": None}),
        # a PROBE accidentally named final_*: explicit kind wins over name
        rec(variant="final_looking_probe", kind="probe"),
    ]
    inp = tmp_path / "sweep_tps.jsonl"
    inp.write_text("".join(json.dumps(r) + "\n" for r in records))
    summarize_sweep.main(["--inp", str(inp)])

    table = (tmp_path / "sweep_tps_table.md").read_text()
    assert "Replicate aggregates" in table
    assert "3.20 ± 0.28" in table  # mean±sd of 3.0 / 3.4
    assert "broken" in table  # defensive sort kept the null-metric row
    # kind-driven naming: the mis-named probe gets the sweep_ prefix
    assert (tmp_path / "eval_curve_sweep_final_looking_probe.txt").exists()
    assert not (tmp_path / "eval_curve_final_looking_probe.txt").exists()
    # seed suffixing: replicates never overwrite each other
    assert (tmp_path / "eval_curve_sweep_probe_x.txt").exists()
    assert (tmp_path / "eval_curve_sweep_probe_x_s1.txt").exists()
