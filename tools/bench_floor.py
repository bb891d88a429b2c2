"""Quiet-floor bench protocol (VERDICT r6 item 7, committed artifact).

The box's external load makes any single bench pass ±10–15% noisy even
under the quiet gate; r5/r6 attribution therefore compared PER-QUERY
FLOORS across three quiet runs — the minimum a query achieves is the
closest observable to its true cost, and the floor TOTAL is the
round-over-round signal that survives load bursts. r6 kept that table
narrative-only in SCALE.md; this tool makes it a committed artifact:

    python tools/bench_floor.py 7 [n_runs]    # -> BENCH_floor_r07.json

Runs ``bench.py`` n_runs times sequentially (each pass re-waits for
quiet and re-marks its own noisy flag), parses each emitted headline
line, and writes the per-query floor table, the floor total, and the
raw per-run lines for provenance. Runs flagged noisy are kept in the
provenance list but EXCLUDED from the floor; if every run was noisy the
artifact says so rather than committing a poisoned floor.
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


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = [r for r in (_one_run(i) for i in range(1, n_runs + 1)) if r]
    quiet = [r for r in runs if not r.get("noisy")]
    out: dict = {
        "round": rnd,
        "n_runs": len(runs),
        "n_quiet": len(quiet),
        "runs": [
            {
                "value": r.get("value"),
                "noisy": r.get("noisy"),
                "host_load_avg_1m_prerun": r.get("host_load_avg_1m_prerun"),
            }
            for r in runs
        ],
    }
    if quiet:
        names = sorted({n for r in quiet for n in r.get("queries", {})})
        floor = {
            n: round(min(r["queries"][n] for r in quiet if n in r["queries"]), 4)
            for n in names
        }
        out["floor_queries"] = floor
        out["floor_total"] = round(sum(floor.values()), 4)
        out["sf"] = quiet[0].get("sf")
    else:
        out["error"] = "every run was noisy — floor not committed"
    path = os.path.join(REPO, f"BENCH_floor_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path} (floor_total={out.get('floor_total')})")


if __name__ == "__main__":
    main()
