"""Training-recipe sweep runner on the synthetic harness.

The experiment registry lives in ``scripts/sweep_variants.yaml`` — variants
as DATA, not code (VERDICT r3 #7): each entry is a list of dotted-config
overrides plus an optional baked ``steps`` budget. Budgets encoded in a
variant's *name* (``*_60k``) MUST be baked as ``steps`` so a bare invocation
cannot train the wrong schedule and then shadow the correct run in the
resume-skip set (ADVICE r3); ``load_variants`` enforces the name↔steps
agreement and ``tests/test_sweep_variants.py`` validates every entry parses
into a real ExperimentConfig.

Usage:
    python scripts/sweep_tps.py [--steps 15000] [--out PATH.jsonl]
        [--only name1,name2]

A variant already recorded in --out *at the same step budget* is skipped, so
an interrupted sweep resumes where it left off (pair with a shell retry
loop; the stall watchdog exits the process on a wedged device RPC).
History/rationale for the variant groups: docs/artifacts/sweep_tps.md,
final_runs.md, and the git log of this file.
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import json
import os
import re
import sys
import time

# `python scripts/sweep_tps.py` puts scripts/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGISTRY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sweep_variants.yaml"
)


VALID_STATUSES = ("active", "refuted", "cancelled")


@dataclasses.dataclass(frozen=True)
class Variant:
    """One registry entry: overrides + optional baked step budget.

    ``status`` gates execution (VERDICT r4 weak #3 / next #7): ``refuted`` /
    ``cancelled`` entries stay in the registry as recorded decisions but the
    runner refuses them without ``--force``, so a later ``--only`` list or a
    name typo cannot spend a chip-hour on a known-dead recipe. Non-active
    entries MUST carry a ``reason`` pointing at the doc/commit that killed
    them. ``seeds`` makes replication a first-class dimension (VERDICT r4
    next #2): each seed is an independent run unit keyed in the resume-skip
    set, trained with ``train.seed=<s>`` on top of the overrides."""

    overrides: tuple[str, ...]
    steps: int | None = None  # None -> the runner's --steps applies
    status: str = "active"
    reason: str | None = None  # mandatory for non-active statuses
    seeds: tuple[int, ...] = (0,)


def load_variants(path: str = REGISTRY_PATH) -> dict[str, Variant]:
    import yaml

    class _DupCheckLoader(yaml.SafeLoader):
        """yaml.safe_load silently last-wins on duplicate keys — a
        copy-pasted variant name would train the wrong recipe under a
        validated name. Fail loud instead."""

    def _no_dup_mapping(loader, node, deep=False):
        seen = set()
        for key_node, _ in node.value:
            key = loader.construct_object(key_node, deep=deep)
            if key in seen:
                raise ValueError(f"duplicate registry key: {key!r}")
            seen.add(key)
        return yaml.SafeLoader.construct_mapping(loader, node, deep)

    _DupCheckLoader.add_constructor(
        yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _no_dup_mapping
    )
    with open(path) as f:
        raw = yaml.load(f, Loader=_DupCheckLoader)
    out: dict[str, Variant] = {}
    for name, spec in raw.items():
        if spec is None:  # bare "name:" entry — clearer than AttributeError
            raise ValueError(f"{name}: empty registry entry")
        steps = spec.get("steps")
        budget = re.search(r"_(\d+)k$", name)
        if budget and steps != int(budget.group(1)) * 1000:
            raise ValueError(
                f"{name}: name encodes a {budget.group(1)}k budget but the "
                f"registry bakes steps={steps} — bake the named budget "
                "(ADVICE r3)"
            )
        status = spec.get("status", "active")
        if status not in VALID_STATUSES:
            raise ValueError(f"{name}: unknown status {status!r}; "
                             f"one of {VALID_STATUSES}")
        reason = spec.get("reason")
        if status != "active" and not reason:
            raise ValueError(
                f"{name}: status={status} requires a `reason` pointing at "
                "the doc/commit that killed it (VERDICT r4 #7)"
            )
        seeds = tuple(spec.get("seeds") or (0,))
        if len(set(seeds)) != len(seeds) or not all(
            isinstance(s, int) for s in seeds
        ):
            raise ValueError(f"{name}: seeds must be distinct ints: {seeds}")
        out[name] = Variant(
            tuple(spec.get("overrides") or ()), steps, status, reason, seeds
        )
    return out


VARIANTS: dict[str, Variant] = load_variants()


def default_variants() -> list[str]:
    """Variants the bare (no ``--only``) sweep runs: plain probes —
    including temporal-mode ones. Convergence runs (baked step budgets /
    LR-decay boundaries sized for them) and trained-feature A/Bs (which
    require ``weights/trained_features*.npz`` to exist) run only via
    ``--only``."""
    return [
        n for n, v in VARIANTS.items()
        if v.steps is None
        and v.status == "active"
        and not any(o.startswith("train.lr_boundaries") for o in v.overrides)
        and "feat" not in n
    ]


def variant_workdir(name: str, variant: Variant, steps: int,
                    seed: int = 0) -> str:
    """Scratch workdir for a variant, keyed on (name, steps, overrides,
    seed) so an edited variant under the same name never silently resumes a
    stale checkpoint from the old config, and seed replicates never share
    checkpoints. Seed 0 keeps the historical (pre-seed-dimension) hash so
    every round-≤4 checkpoint still resolves for diagnose_landmarks. Shared
    with scripts/diagnose_landmarks.py — the two MUST derive identical paths
    or post-hoc diagnostics restore the wrong (or no) checkpoint."""
    import hashlib

    key = f"{steps}|{'|'.join(variant.overrides)}"
    if seed != 0:
        key += f"|seed={seed}"
    cfg_key = hashlib.sha1(key.encode()).hexdigest()[:8]
    return f"/tmp/sweep_work/{name}_{cfg_key}"


def variant_config(name: str, variant: Variant, steps: int,
                   workdir: str | None = None, seed: int = 0):
    """The exact ExperimentConfig a sweep run of ``variant`` trains under
    (base sweep protocol + the variant's overrides). Single source of truth
    for both the runner and diagnose_landmarks. ``train.seed`` is appended
    AFTER the variant overrides so the seed dimension wins even if a recipe
    ever bakes a seed."""
    from imm_tpu.configs import get_preset
    from imm_tpu.utils.config import apply_overrides

    return apply_overrides(
        get_preset("synthetic"),
        [
            f"name={name}",
            "train.batch_size=128",
            f"train.total_steps={steps}",
            "eval_every=3000",
            f"workdir={workdir or variant_workdir(name, variant, steps, seed)}",
        ]
        + list(variant.overrides)
        + [f"train.seed={seed}"],
    )


def run_variant(name: str, variant: Variant, steps: int, out_path: str,
                seed: int = 0):
    """Train one (variant, seed) replicate for ``steps`` and append its
    record to out_path.

    ``steps`` is the *effective* budget (the variant's baked budget when it
    has one — resolved by ``main``)."""
    import jax

    from imm_tpu.experiment import build_experiment

    # Long runs wedge occasionally (lost device RPC -> stall watchdog exits
    # 42): the per-variant scratch workdir (variant_workdir) lets Orbax
    # checkpoint every 1000 steps and a shell retry loop resume instead of
    # restarting. After a resume the recorded curve covers only the final
    # process's steps; `final` is always the converged number.
    overrides = list(variant.overrides)
    config = variant_config(name, variant, steps, seed=seed)
    exp = build_experiment(config, restore=True)
    t0 = time.time()
    state = exp.run()
    final = exp.eval_fn(state)
    curve = [
        {k: v for k, v in h.items() if k == "step" or k.startswith("eval/")}
        for h in exp.trainer.history
        if any(k.startswith("eval/") for k in h)
    ]
    rec = {
        "variant": name,
        "steps": steps,
        "seed": seed,
        # Explicit record kind so downstream artifact naming never infers it
        # from the variant name (ADVICE r4: a probe accidentally named
        # final_* must not overwrite a historical final-run curve file).
        "kind": "final" if variant.steps is not None else "probe",
        "overrides": overrides,
        "final": final,
        "curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[sweep] {name} seed={seed}: "
          f"test={final['landmark_error_test_pct']:.2f}%IOD "
          f"({rec['wall_s']:.0f}s)", flush=True)
    jax.clear_caches()


def _recorded(out_path: str) -> set[tuple[str, int, int]]:
    """(variant, steps, seed) triples already recorded in ``out_path``.

    Keyed on steps too: a mis-stepped run must not shadow the real one
    (ADVICE r3). Pre-seed-dimension records carry no ``seed`` field and are
    exactly the seed-0 runs (train.seed defaulted to 0), so they key as 0.
    Re-read before every variant, not once at startup — a concurrent runner
    may have recorded it since."""
    done: set[tuple[str, int, int]] = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    r = json.loads(line)
                    done.add((r["variant"], int(r["steps"]),
                              int(r.get("seed", 0))))
                except (ValueError, KeyError):
                    # A SIGKILLed writer can leave a torn final line; treat
                    # it as not-recorded instead of crashing every future
                    # queue invocation on it.
                    print(f"[sweep] ignoring unparseable line in {out_path}: "
                          f"{line[:80]!r}", flush=True)
    return done


@contextlib.contextmanager
def _chip_lock(path: str):
    """Advisory exclusive lock serializing sweep runners on the one chip.

    Held for the duration of one variant run; a second queue blocks here
    (announcing it) instead of time-slicing the device. flock is released
    by the kernel even if the holder is SIGKILLed, so a dead runner never
    wedges the queue. Empty path disables (CPU-only smoke tests)."""
    if not path:
        yield
        return
    import fcntl

    with open(path, "a+") as f:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            print(f"[sweep] chip lock {path} held by another runner; "
                  "waiting", flush=True)
            fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=15_000,
                        help="budget for variants without a baked one")
    parser.add_argument(
        "--out", default="docs/artifacts/sweep_tps.jsonl",
    )
    parser.add_argument(
        "--only", default=None, help="comma-separated variant subset"
    )
    parser.add_argument(
        "--seeds", default=None,
        help="comma-separated seed list; overrides each variant's registry "
             "`seeds` (default: the registry's, itself defaulting to 0)",
    )
    parser.add_argument(
        "--force", action="store_true",
        help="run refuted/cancelled registry entries anyway",
    )
    parser.add_argument(
        "--lock-file", default="/tmp/imm_tpu_chip.lock",
        help="advisory lock serializing runners on the single chip "
             "('' disables)",
    )
    args = parser.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S")
    from imm_tpu.cli._common import enable_compile_cache

    enable_compile_cache()

    names = args.only.split(",") if args.only else default_variants()
    unknown = sorted(set(names) - VARIANTS.keys())
    if unknown:  # fail in milliseconds, not hours into the sweep
        raise SystemExit(f"unknown variants {unknown}; options: {sorted(VARIANTS)}")
    # Status gate fails the WHOLE invocation up front (not per-variant at
    # its turn, hours in): a dead entry in a queue is a planning error.
    dead = [n for n in names if VARIANTS[n].status != "active"]
    if dead and not args.force:
        raise SystemExit(
            f"refusing non-active variants {dead} "
            f"({', '.join(f'{n}: {VARIANTS[n].reason}' for n in dead)}); "
            "re-run with --force to override (VERDICT r4 #7)"
        )
    cli_seeds = ([int(s) for s in args.seeds.split(",")]
                 if args.seeds else None)
    for name in names:
        variant = VARIANTS[name]
        steps = variant.steps if variant.steps is not None else args.steps
        seeds = cli_seeds if cli_seeds is not None else variant.seeds
        for seed in seeds:
            # Serialize runners on the single chip: two sweep queues launched
            # within minutes of each other once time-sliced the device
            # (halved img/s) AND both trained the same variant — each read
            # the done-set at startup, before either had recorded it
            # (round-4 postmortem: bitwise-duplicate temporal_k30_noisefeat
            # rows). The lock makes concurrent queues interleave at run
            # granularity, and the done-set is re-read UNDER the lock so the
            # loser of the race skips.
            with _chip_lock(args.lock_file):
                if (name, steps, seed) in _recorded(args.out):
                    print(f"[sweep] {name} seed={seed}: already recorded at "
                          f"{steps} steps, skipping", flush=True)
                    continue
                run_variant(name, variant, steps, args.out, seed=seed)


if __name__ == "__main__":
    main()
