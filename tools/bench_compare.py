"""Compare two bench.py JSON emissions, refusing load-polluted runs.

The box is shared: a busy neighbor inflates wall-clock up to ~2x, so a
round-over-round "regression" (or "win") measured under different load is
an artifact, not a signal. bench.py stamps each emission with the
pre-run 1-minute load average and a per-query load sample; this tool
refuses to compare when either run is marked noisy (prerun load above
``bench.NOISE_LOAD_1M``) and flags per-query deltas whose two sides were
measured under very different load.

Usage:
    python tools/bench_compare.py BENCH_r02.json BENCH_r03.json
    python tools/bench_compare.py --force a.json b.json   # compare anyway
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import NOISE_LOAD_1M  # single source of truth for the threshold

#: per-query load-delta above which a timing ratio is annotated as suspect
LOAD_DELTA_SUSPECT = 8.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--force", action="store_true", help="compare even if noisy")
    args = ap.parse_args()

    def load_run(path: str) -> dict:
        d = json.load(open(path))
        # the driver's BENCH_r*.json wraps the bench emission in "parsed"
        return d.get("parsed", d)

    old = load_run(args.old)
    new = load_run(args.new)

    refused = False
    for label, run in (("old", old), ("new", new)):
        load = run.get("host_load_avg_1m_prerun", run.get("host_load_avg_1m"))
        noisy = run.get("noisy", load is not None and load > NOISE_LOAD_1M)
        calib = ""
        if "cpu_calib_pre_sec" in run:
            calib = (
                f" calib={run['cpu_calib_pre_sec']}->"
                f"{run['cpu_calib_post_sec']}s"
            )
        print(
            f"{label}: total={run['value']}s sf={run['sf']} "
            f"prerun_load={load} noisy={noisy}{calib}"
        )
        if noisy:
            refused = True
    if refused and not args.force:
        print(
            f"\nREFUSED: at least one run started under load > {NOISE_LOAD_1M} "
            "— rerun on a quieter box or pass --force (and distrust the result)."
        )
        return 1

    qo, qn = old.get("queries", {}), new.get("queries", {})
    lo, ln = old.get("query_load_1m", {}), new.get("query_load_1m", {})
    print(f"\n{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(qo) | set(qn)):
        a, b = qo.get(name), qn.get(name)
        if a is None or b is None:
            print(f"{name:34s} {a or '-':>8} {b or '-':>8}   (only one side)")
            continue
        ratio = b / a if a else float("inf")
        suspect = ""
        if name in lo and name in ln and abs(lo[name] - ln[name]) > LOAD_DELTA_SUSPECT:
            suspect = f"  SUSPECT(load {lo[name]} vs {ln[name]})"
        print(f"{name:34s} {a:8.3f} {b:8.3f} {ratio:6.2f}x{suspect}")
    ratio = new["value"] / old["value"] if old.get("value") else float("inf")
    print(f"\ntotal: {old['value']:.2f}s -> {new['value']:.2f}s ({ratio:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
