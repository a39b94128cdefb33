"""Render sweep_tps.jsonl into a markdown table + per-variant curve files.

Usage: python scripts/summarize_sweep.py [--in docs/artifacts/sweep_tps.jsonl]
Writes docs/artifacts/sweep_tps.md and eval_curve_sweep_<variant>.txt files.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inp", default="docs/artifacts/sweep_tps.jsonl")
    args = parser.parse_args(argv)
    out_dir = os.path.dirname(args.inp)

    records = []
    with open(args.inp) as f:
        for line in f:
            if line.strip():
                records.append(json.loads(line))
    records.sort(key=lambda r: r["final"]["landmark_error_test_pct"])

    lines = [
        "# TPS-pair recipe sweep (synthetic harness, K=10, B=128, "
        f"{records[0]['steps']} steps)",
        "",
        "Round-1 control floored at 7.36% IOD at 100k steps; temporal mode "
        "reached 2.93%. Hypothesis under test: the individual warp component "
        "(the only source<->target pose delta in TPS mode) is too small to "
        "force pose through the landmark bottleneck (VERDICT r1 item 3).",
        "",
        "| variant | test %IOD | train %IOD | overrides |",
        "|---|---|---|---|",
    ]
    for r in records:
        ov = " ".join(r["overrides"]) or "(round-1 flagship recipe)"
        lines.append(
            f"| {r['variant']} | **{r['final']['landmark_error_test_pct']:.2f}** "
            f"| {r['final']['landmark_error_train_pct']:.2f} | `{ov}` |"
        )
        curve_path = os.path.join(
            out_dir, f"eval_curve_sweep_{r['variant']}.txt"
        )
        with open(curve_path, "w") as cf:
            for p in r["curve"]:
                cf.write(
                    f"step {p['step']} "
                    f"test={p['eval/landmark_error_test_pct']:.4g} "
                    f"train={p['eval/landmark_error_train_pct']:.4g}\n"
                )
    with open(os.path.join(out_dir, "sweep_tps.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
