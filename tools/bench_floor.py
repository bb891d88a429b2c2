"""Quiet-floor bench protocol (VERDICT r6 item 7, committed artifact).

The box's external load makes any single bench pass ±10–15% noisy even
under the quiet gate; r5/r6 attribution therefore compared PER-QUERY
FLOORS across several runs — the minimum a query achieves is the
closest observable to its true cost, and the floor TOTAL is the
round-over-round signal that survives load bursts. r6 kept that table
narrative-only in SCALE.md; this tool makes it a committed artifact:

    python tools/bench_floor.py 8 [n_runs]    # -> BENCH_floor_r08.json

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

Per-query noise stamping (VERDICT r7 item 4): bench.py already records
a 1-minute load stamp taken at the start of every query; each run
record now carries it, and a per-query sample counts as QUIET iff its
run passed the run-level gates AND its own load stamp stayed under
``PER_QUERY_LOAD_NOISY`` — so a mid-run burst (the exact blind spot of
the run-level pre/post probes) demotes only the queries it touched.
The committed ``floor_queries`` prefer the quiet-sample minimum when
any quiet sample exists (a certified calm measurement); the
min-over-everything is kept alongside as ``floor_queries_all`` (always
<= the quiet floor — contention only inflates — so it remains the
tightest lower bound), with per-query quiet counts in
``n_quiet_per_query``.

Throughput floors (VERDICT r7 item 1): the reference-corpus MB/s
metrics ride along per run (read from the BENCH_detail.json sidecar,
which always carries them even when the stdout line sheds them) and
are floored as a MAX across ALL runs — contention only ever DEFLATES
throughput, so every sample is a valid lower bound on the true calm
value and the unconditional maximum is the tightest certified bound
(r9 dropped the r8 quiet-preference here: preferring a "certified
calm" sample can only LOWER a bound contention cannot inflate, and a
mid-window burst behind a quiet pre-stamp did exactly that live).
``n_quiet_<key>`` remains the confidence signal for how close the
bound likely sits.

Each run's full per-query timing dict is kept in the provenance, and a
re-invocation for the same round MERGES with the runs already in the
committed artifact — on a box with hour-scale load bursts, repeatedly
invoking the tool monotonically tightens the floor instead of
overwriting a calm invocation's floors with a stormy one's. Runs are
stamped with their scale factor and a merge REFUSES runs whose sf
differs from the artifact's (ADVICE r7: the old merge read 'sf' off a
prior-merged record that never carried one, committing 'sf': null, and
would have silently mixed scale factors into one floor table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_SIDECAR = os.path.join(REPO, "BENCH_detail.json")

#: per-query 1-minute load above which that query's sample is not quiet.
#: Calibration (r8, two live runs): in a genuinely calm pass (external
#: load 0.05) the stamps ran 1.2–2.12 — the bench JVM's own bursty
#: per-query work mostly amortizes out of the lagging 1-minute average —
#: while a pass that straddled an external burst (prerun 3.37, box later
#: at 31) read 5.13–9.35 and its samples inflated 0.97–1.60×. The
#: run-level external gate (bench.NOISE_LOAD_1M = 4.0) therefore
#: separates the two regimes cleanly at per-query granularity too, and a
#: sample stamped above it was demonstrably taken under contention.
PER_QUERY_LOAD_NOISY = 4.0


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
    # the sidecar (rewritten by the bench run that just exited) carries the
    # fields the stdout line may shed under its byte budget: per-query load
    # stamps and the reference-corpus throughput pair
    try:
        detail = json.load(open(DETAIL_SIDECAR))
    except (OSError, ValueError):
        detail = {}
    for key in ("reference_corpus_mb_per_sec", "reference_corpus_8x_mb_per_sec"):
        if key not in parsed and key in detail:
            parsed[key] = detail[key]
    det = detail.get("detail") or {}
    parsed["query_load_1m"] = det.get("query_load_1m")
    parsed["reference_corpus_load_1m"] = det.get("reference_corpus_load_1m")
    parsed["reference_corpus_8x_load_1m"] = det.get("reference_corpus_8x_load_1m")
    # post-window stamps accumulate across merged runs (VERDICT r9 item 3):
    # the sidecar is overwritten per run, so the floor artifact is the
    # durable store for the self-load calibration samples that will back
    # the post-stamp gate once >=10 quiet-window samples exist
    parsed["reference_corpus_post_load_1m"] = det.get(
        "reference_corpus_post_load_1m"
    )
    print(
        f"run {idx}: total={parsed.get('value')}s noisy={parsed.get('noisy')}"
        f" load={parsed.get('host_load_avg_1m_prerun')}"
        f" mb/s={parsed.get('reference_corpus_mb_per_sec')}",
        file=sys.stderr,
    )
    return parsed


def _prior(path: str) -> tuple[list[dict], float | None]:
    """Per-run records (and the artifact sf) from an existing same-round
    artifact, if they carry the per-query dicts needed to recompute floors
    (older artifacts kept only totals — those merge as provenance-free and
    are dropped)."""
    try:
        prior = json.load(open(path))
    except (OSError, ValueError):
        return [], None
    runs = [r for r in prior.get("runs", []) if isinstance(r.get("queries"), dict)]
    sf = prior.get("sf")
    if sf is None:  # pre-ADVICE-fix artifact: recover sf from any run record
        sf = next((r["sf"] for r in runs if r.get("sf") is not None), None)
    return runs, sf


def _headline_noisy(r: dict) -> bool:
    """The flag that governs this run's PER-QUERY samples. Newer bench
    lines carry component flags (r9: a burst hitting only the corpus
    phase OR'd into the single flag and zeroed n_quiet for per-query
    samples taken minutes earlier under calm load); older records fall
    back to the monolithic flag."""
    v = r.get("noisy_headline")
    return bool(r.get("noisy")) if v is None else bool(v)


def _corpus_noisy(r: dict) -> bool:
    """The flag that governs this run's throughput samples."""
    v = r.get("noisy_corpus")
    return bool(r.get("noisy")) if v is None else bool(v)


def _quiet_samples(runs: list[dict], name: str) -> list[float]:
    """Timings for ``name`` from headline-quiet runs whose per-query load
    stamp (when recorded) also stayed under the per-query gate."""
    out = []
    for r in runs:
        if _headline_noisy(r) or name not in r.get("queries", {}):
            continue
        stamp = (r.get("query_load_1m") or {}).get(name)
        if stamp is not None and stamp > PER_QUERY_LOAD_NOISY:
            continue
        out.append(r["queries"][name])
    return out


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = os.path.join(REPO, f"BENCH_floor_r{rnd:02d}.json")
    runs, sf = _prior(path)
    n_prior = len(runs)
    for i in range(1, n_runs + 1):
        r = _one_run(i)
        if not r:
            continue
        if r.get("sf") is None:
            # a fresh run whose parsed line lacks sf must neither anchor the
            # artifact's sf nor bypass the mixing guard (ADVICE r8)
            print(
                f"run {i}: parsed line carries no sf — REFUSING to merge",
                file=sys.stderr,
            )
            continue
        if sf is None:
            sf = r.get("sf")
        elif r.get("sf") != sf:
            print(
                f"run {i}: sf={r.get('sf')} != artifact sf={sf} — REFUSING to "
                "merge (floors must come from one scale factor)",
                file=sys.stderr,
            )
            continue
        runs.append(r)
    out: dict = {
        "round": rnd,
        "sf": sf,
        "n_runs": len(runs),
        "n_prior_merged": n_prior,
        "n_quiet": sum(1 for r in runs if not r.get("noisy")),
        "n_quiet_headline": sum(1 for r in runs if not _headline_noisy(r)),
        "n_quiet_corpus": sum(1 for r in runs if not _corpus_noisy(r)),
        "runs": [
            {
                "value": r.get("value"),
                "noisy": r.get("noisy"),
                "noisy_headline": r.get("noisy_headline"),
                "noisy_corpus": r.get("noisy_corpus"),
                # legacy prior-merge records that never carried sf stay null
                # in the provenance — only the top-level sf asserts the
                # single-scale assumption, per-run sf records what was
                # actually measured (ADVICE r8)
                "sf": r.get("sf"),
                "host_load_avg_1m_prerun": r.get("host_load_avg_1m_prerun"),
                "queries": r.get("queries"),
                "query_load_1m": r.get("query_load_1m"),
                "reference_corpus_mb_per_sec": r.get("reference_corpus_mb_per_sec"),
                "reference_corpus_8x_mb_per_sec": r.get(
                    "reference_corpus_8x_mb_per_sec"
                ),
                "reference_corpus_load_1m": r.get("reference_corpus_load_1m"),
                "reference_corpus_8x_load_1m": r.get(
                    "reference_corpus_8x_load_1m"
                ),
                "reference_corpus_post_load_1m": r.get(
                    "reference_corpus_post_load_1m"
                ),
            }
            for r in runs
        ],
    }
    if runs:
        names = sorted({n for r in runs for n in r.get("queries", {})})
        floor_all = {
            n: round(min(r["queries"][n] for r in runs if n in r["queries"]), 4)
            for n in names
        }
        quiet = {n: _quiet_samples(runs, n) for n in names}
        out["n_quiet_per_query"] = {n: len(quiet[n]) for n in names}
        out["floor_queries"] = {
            n: round(min(quiet[n]), 4) if quiet[n] else floor_all[n] for n in names
        }
        out["floor_queries_all"] = floor_all
        out["floor_total"] = round(sum(out["floor_queries"].values()), 4)
        out["floor_total_all"] = round(sum(floor_all.values()), 4)
        # throughput: contention only DEFLATES MB/s, so every sample —
        # noisy or not — is a valid LOWER BOUND on the true calm
        # throughput, and MAX over ALL runs is the tightest certified
        # bound. Quiet-preference (the r8 scheme, symmetric with the
        # timing floors) is logically backwards for a max-estimator and
        # failed live in r9: a pre-stamp-quiet sample crushed by a
        # mid-window burst (29.9 MB/s) outranked a 42.98 observed under
        # partial load — preferring "certified calm" can only LOWER a
        # bound that contention cannot inflate. n_quiet stays as the
        # confidence signal for how CLOSE the bound likely is.
        for key in ("reference_corpus_mb_per_sec", "reference_corpus_8x_mb_per_sec"):
            vals_all = [r[key] for r in runs if r.get(key) is not None]
            vals_quiet = [
                r[key]
                for r in runs
                if r.get(key) is not None
                and not _corpus_noisy(r)
                and (
                    r.get("reference_corpus_load_1m") is None
                    or r["reference_corpus_load_1m"] <= PER_QUERY_LOAD_NOISY
                )
            ]
            if vals_all:
                out[f"floor_{key}"] = max(vals_all)
                out[f"n_runs_{key}"] = len(vals_all)
                out[f"n_quiet_{key}"] = len(vals_quiet)
        # caveats key on the COMPONENT flags (ADVICE r9 low): the monolithic
        # n_quiet zeroes when only the corpus phase was loud, misattributing
        # a corpus-side burst to per-query floors certified headline-quiet —
        # the exact failure the r9 component-flag split was built to fix
        if not out["n_quiet_headline"]:
            out["caveat"] = (
                "no run passed the headline quiet gates — per-query floors "
                "are upper bounds"
            )
        if not out["n_quiet_corpus"]:
            out["caveat_corpus"] = (
                "no run's corpus phase was quiet — throughput maxima remain "
                "valid lower bounds but likely sit below the calm value"
            )
    else:
        out["error"] = "no run produced a parseable headline line"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {path} (floor_total={out.get('floor_total')}, "
        f"n_runs={out['n_runs']}, n_quiet={out['n_quiet']}, "
        f"mb/s_floor={out.get('floor_reference_corpus_mb_per_sec')})"
    )


if __name__ == "__main__":
    main()
