"""Floor-protocol invariants, pinned without running Spark (VERDICT r7
items 1+4, ADVICE r7 #1): runs from a different scale factor must never
merge into one floor table; per-query load stamps demote only the
samples a mid-run burst touched; throughput floors are a MAX (contention
only deflates MB/s); and the committed floors prefer certified-quiet
samples while keeping the min-over-everything as the tightest bound."""

from __future__ import annotations

import json
import sys

from tools import bench_floor


def _run(value, noisy, sf=0.1, queries=None, loads=None, mbs=None, corpus_load=None):
    return {
        "value": value,
        "noisy": noisy,
        "sf": sf,
        "host_load_avg_1m_prerun": 1.0,
        "queries": queries or {"q": value},
        "query_load_1m": loads,
        "reference_corpus_mb_per_sec": mbs,
        "reference_corpus_8x_mb_per_sec": None,
        "reference_corpus_load_1m": corpus_load,
    }


def _invoke(tmp_path, monkeypatch, rnd, n_runs, fresh_runs, prior=None):
    path = tmp_path / f"BENCH_floor_r{rnd:02d}.json"
    if prior is not None:
        path.write_text(json.dumps(prior))
    it = iter(fresh_runs)
    monkeypatch.setattr(bench_floor, "REPO", str(tmp_path))
    monkeypatch.setattr(bench_floor, "_one_run", lambda i: next(it))
    monkeypatch.setattr(sys, "argv", ["bench_floor.py", str(rnd), str(n_runs)])
    bench_floor.main()
    return json.loads(path.read_text())


def test_merge_refuses_mismatched_sf(tmp_path, monkeypatch):
    prior = {
        "sf": 0.1,
        "runs": [_run(10.0, False)],
    }
    out = _invoke(
        tmp_path, monkeypatch, 99, 2,
        [_run(5.0, False, sf=0.01), _run(9.0, False, sf=0.1)],
        prior=prior,
    )
    assert out["sf"] == 0.1
    assert out["n_runs"] == 2  # the sf=0.01 run was refused
    assert all(r["sf"] == 0.1 for r in out["runs"])
    assert out["floor_queries"]["q"] == 9.0  # the 5.0 from sf0.01 never lands


def test_prior_artifact_sf_recovered_from_run_records(tmp_path, monkeypatch):
    # pre-fix artifacts committed 'sf': null at top level; the run records
    # (once they carry sf) must still anchor the merge guard
    prior = {"sf": None, "runs": [_run(10.0, False, sf=0.1)]}
    out = _invoke(tmp_path, monkeypatch, 99, 1, [_run(8.0, False, sf=0.1)], prior)
    assert out["sf"] == 0.1 and out["n_runs"] == 2


def test_per_query_burst_demotes_only_touched_queries(tmp_path, monkeypatch):
    calm = _run(
        1.0, False,
        queries={"a": 0.5, "b": 0.5},
        loads={"a": 1.2, "b": 1.4},
    )
    # run-level quiet (the r7 blind spot) but query b straddled a burst
    # and reads faster-is-impossible slower; a stayed calm
    burst = _run(
        1.2, False,
        queries={"a": 0.45, "b": 0.75},
        loads={"a": 1.5, "b": 19.0},
    )
    out = _invoke(tmp_path, monkeypatch, 99, 2, [calm, burst])
    assert out["n_quiet_per_query"] == {"a": 2, "b": 1}
    # a's quiet floor sees both samples; b's only the calm one
    assert out["floor_queries"] == {"a": 0.45, "b": 0.5}
    # the min-over-everything keeps the tighter (still valid) bound
    assert out["floor_queries_all"] == {"a": 0.45, "b": 0.5}


def test_quiet_floor_falls_back_to_all_when_no_quiet_sample(tmp_path, monkeypatch):
    noisy1 = _run(2.0, True, queries={"a": 2.0}, loads={"a": 9.0})
    noisy2 = _run(1.8, True, queries={"a": 1.8}, loads={"a": 8.0})
    out = _invoke(tmp_path, monkeypatch, 99, 2, [noisy1, noisy2])
    assert out["n_quiet_per_query"] == {"a": 0}
    assert out["floor_queries"] == {"a": 1.8}  # upper bound, flagged by n_quiet
    assert out["caveat"].startswith("no run passed")


def test_caveat_keys_on_component_flags(tmp_path, monkeypatch):
    """ADVICE r9 low: a run set whose only noise was in the corpus phase
    must NOT stamp the headline-floor caveat — the per-query floors were
    headline-quiet-certified; the corpus side gets its own caveat keyed
    on n_quiet_corpus (and vice versa: headline-loud runs with a quiet
    corpus phase caveat only the timing floors)."""
    corpus_loud = _run(1.0, True, queries={"a": 0.5}, loads={"a": 1.2},
                       mbs=38.0, corpus_load=9.0)
    corpus_loud["noisy_headline"] = False
    corpus_loud["noisy_corpus"] = True
    out = _invoke(tmp_path, monkeypatch, 99, 1, [corpus_loud])
    assert out["n_quiet_headline"] == 1 and out["n_quiet_corpus"] == 0
    assert "caveat" not in out, "headline caveat misattributed corpus noise"
    assert out["caveat_corpus"].startswith("no run's corpus phase")

    head_loud = _run(2.0, True, queries={"a": 2.0}, loads={"a": 9.0},
                     mbs=40.0, corpus_load=1.5)
    head_loud["noisy_headline"] = True
    head_loud["noisy_corpus"] = False
    out = _invoke(tmp_path, monkeypatch, 98, 1, [head_loud])
    assert out["caveat"].startswith("no run passed the headline")
    assert "caveat_corpus" not in out


def test_throughput_floor_is_max_over_all_runs(tmp_path, monkeypatch):
    """Contention only DEFLATES MB/s, so every sample — however loud its
    window — is a valid lower bound on the true calm throughput and the
    unconditional max is the tightest certified bound. The r8
    quiet-preference failed live in r9: a pre-stamp-quiet sample crushed
    by a mid-window burst outranked a higher reading from a run whose
    flags were loud. n_quiet remains the closeness-confidence signal."""
    runs = [
        _run(1.0, False, mbs=40.0, corpus_load=2.0),   # calm
        _run(1.1, False, mbs=55.0, corpus_load=15.0),  # loud window, still a bound
        _run(2.0, True, mbs=20.0, corpus_load=3.0),    # noisy run, still a bound
    ]
    out = _invoke(tmp_path, monkeypatch, 99, 3, runs)
    assert out["floor_reference_corpus_mb_per_sec"] == 55.0
    assert out["n_runs_reference_corpus_mb_per_sec"] == 3
    assert out["n_quiet_reference_corpus_mb_per_sec"] == 1


def test_committed_r08_artifact_invariants():
    """The committed round-8 artifact must carry the new provenance: a
    non-null sf on every run record, per-query quiet counts, and the
    throughput floors the 2x-baseline gate reads."""
    import os

    path = os.path.join(bench_floor.REPO, "BENCH_floor_r08.json")
    if not os.path.exists(path):
        return  # early in the round — the driver/bench will create it
    d = json.load(open(path))
    assert d["sf"] is not None
    assert all(r.get("sf") == d["sf"] for r in d["runs"])
    assert "n_quiet_per_query" in d
    assert "floor_reference_corpus_mb_per_sec" in d
