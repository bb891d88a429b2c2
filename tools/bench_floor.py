"""Quiet-floor bench protocol (VERDICT r6 item 7, committed artifact).

The box's external load makes any single bench pass ±10–15% noisy even
under the quiet gate; r5/r6 attribution therefore compared PER-QUERY
FLOORS across several runs — the minimum a query achieves is the
closest observable to its true cost, and the floor TOTAL is the
round-over-round signal that survives load bursts. r6 kept that table
narrative-only in SCALE.md; this tool makes it a committed artifact:

    python tools/bench_floor.py 7 [n_runs]    # -> BENCH_floor_r07.json

Floors are taken across ALL runs, including ones flagged noisy.
Contention only ever INFLATES wall-clock, so a per-query minimum over
more runs is still a valid floor — while the first version's
quiet-only floor had the opposite failure, observed live in r7: a
neighbor that arrives after the pre-run load gate and leaves before
the post-run calibration probe produces a run that is badly inflated
(29.5 s vs a 12 s floor) yet flagged quiet, and when every OTHER run
is (correctly) flagged noisy, the "quiet-only" floor is computed from
exactly the poisoned run. The noisy flag remains the per-run validity
stamp in the provenance list, and ``n_quiet`` is the artifact-level
confidence signal — a floor with ``n_quiet == 0`` should be read as an
upper bound on the true floor, not a measurement.

Each run's full per-query timing dict is kept in the provenance, and a
re-invocation for the same round MERGES with the runs already in the
committed artifact — on a box with hour-scale load bursts, repeatedly
invoking the tool monotonically tightens the floor instead of
overwriting a calm invocation's floors with a stormy one's.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one_run(idx: int) -> dict | None:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        parsed = json.loads(line)
    except ValueError:
        parsed = None
    if proc.returncode != 0 or parsed is None:
        print(f"run {idx}: FAILED rc={proc.returncode}", file=sys.stderr)
        return None
    print(
        f"run {idx}: total={parsed.get('value')}s noisy={parsed.get('noisy')}"
        f" load={parsed.get('host_load_avg_1m_prerun')}",
        file=sys.stderr,
    )
    return parsed


def _prior_runs(path: str) -> list[dict]:
    """Per-run records from an existing same-round artifact, if they carry
    the per-query dicts needed to recompute floors (older artifacts kept
    only totals — those merge as provenance-free and are dropped)."""
    try:
        prior = json.load(open(path))
    except (OSError, ValueError):
        return []
    return [r for r in prior.get("runs", []) if isinstance(r.get("queries"), dict)]


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = os.path.join(REPO, f"BENCH_floor_r{rnd:02d}.json")
    runs = _prior_runs(path)
    n_prior = len(runs)
    runs += [r for r in (_one_run(i) for i in range(1, n_runs + 1)) if r]
    out: dict = {
        "round": rnd,
        "n_runs": len(runs),
        "n_prior_merged": n_prior,
        "n_quiet": sum(1 for r in runs if not r.get("noisy")),
        "runs": [
            {
                "value": r.get("value"),
                "noisy": r.get("noisy"),
                "host_load_avg_1m_prerun": r.get("host_load_avg_1m_prerun"),
                "queries": r.get("queries"),
            }
            for r in runs
        ],
    }
    if runs:
        names = sorted({n for r in runs for n in r.get("queries", {})})
        floor = {
            n: round(min(r["queries"][n] for r in runs if n in r["queries"]), 4)
            for n in names
        }
        out["floor_queries"] = floor
        out["floor_total"] = round(sum(floor.values()), 4)
        out["sf"] = runs[0].get("sf")
        if not out["n_quiet"]:
            out["caveat"] = (
                "no run passed the quiet gates — floor is an upper bound"
            )
    else:
        out["error"] = "no run produced a parseable headline line"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {path} (floor_total={out.get('floor_total')}, "
        f"n_runs={out['n_runs']}, n_quiet={out['n_quiet']})"
    )


if __name__ == "__main__":
    main()
