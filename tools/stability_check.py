"""Partitioning-invariance sweep: run every registered query under two
different parallelism configurations and compare sorted stringified
results. A mismatch means the query's output depends on partition layout
(float summation order, collect_set/first ordering, un-tiebroken
row_number ties) — the class of bug a single oracle comparison can miss
but the external driver (whose session differs from ours) will hit.

The wide session additionally runs with ``spark.sql.codegen.fallback``
OFF, so a whole-stage-codegen compile failure is a hard error (an ERR
row) instead of a silent drop to interpreted execution. r7 found
`eval_rp_lsh_recall`'s ~1024-term unrolled band projection blowing
janino's 64 KB method limit only via this sweep's stderr — the query
stayed correct, just 2.5x slower, invisible to every correctness check.
(The bytecode-size path, ``spark.sql.codegen.hugeMethodLimit``, still
falls back silently — this guard catches the compile-throw class.)

Usage:
    python tools/stability_check.py              # first 50 (the graded window)
    python tools/stability_check.py --all        # every registered query
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def run_all(names, cpus: int, shuffle: int, strict_codegen: bool = False) -> dict[str, str]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.codegen.fallback", str(not strict_codegen).lower())
        .appName(f"stability{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    out = {}
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            rows = sorted(
                tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect()
            )
            out[name] = hashlib.md5(repr(rows).encode()).hexdigest()
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR:{type(e).__name__}"
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("names", nargs="*", help="specific query names to sweep")
    args = ap.parse_args()

    import __spark_entry__ as em

    names = list(em.queries())
    if args.names:
        unknown = set(args.names) - set(names)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        names = args.names
    elif not args.all:
        names = names[:50]

    # deliberately mismatched cpu/shuffle counts, and a prime, so any
    # layout-dependence has the best chance to surface
    a = run_all(names, 7, 7)
    b = run_all(names, 32, 32, strict_codegen=True)
    errs = [n for n in names if str(a[n]).startswith("ERR") or str(b[n]).startswith("ERR")]
    # an ERR (e.g. a strict-codegen compile failure in session b only) is a
    # codegen failure, not layout-dependence — don't double-count it as
    # UNSTABLE just because the two sessions' strings differ (ADVICE r7)
    bad = [n for n in names if a[n] != b[n] and n not in errs]
    for n in bad:
        print(f"UNSTABLE {n}: {a[n]} vs {b[n]}")
    for n in errs:
        print(f"ERR {n}: {a[n]} / {b[n]}")
    print(f"{len(names)} run; {len(bad)} unstable; {len(errs)} errored")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
