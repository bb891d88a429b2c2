"""Staleness scoping of the SCALE_CHECK quietest-wins merge (ADVICE r9
medium): pipeline entries now carry a code fingerprint, and a prior
(quieter) entry may only outrank a fresh sweep when its fingerprint
matches the current code — a calm measurement taken BEFORE a code/plan
change must never be kept over a post-change sweep, however loud, or
SCALE_CHECK.json silently reports pre-change growth ratios as current.
No Spark session: merge_sweep and code_fingerprint are pure."""

from __future__ import annotations

from tools.scale_check import code_fingerprint, merge_sweep

FP = "aaaa000011112222"


def _rec(noisy, max_load, fp=FP, ratio=2.0):
    return {
        "growth_ratio": ratio,
        "noisy": noisy,
        "load_1m_per_measurement": {"1x": max_load, "50x": max_load},
        "fingerprint": fp,
    }


def test_quieter_same_fingerprint_prior_survives():
    prior = {"p": _rec(False, 0.5, ratio=1.8)}
    fresh = {"p": _rec(False, 2.0, ratio=2.1)}
    out = merge_sweep(prior, fresh, FP)
    assert out["p"]["growth_ratio"] == 1.8  # calmer same-code entry kept


def test_stale_fingerprint_prior_always_loses():
    # prior is quieter AND quiet-flagged, but from pre-change code: the
    # fresh (louder) sweep must replace it — this is the exact masking
    # failure the advisor named
    prior = {"p": _rec(False, 0.2, fp="deadbeefdeadbeef", ratio=1.2)}
    fresh = {"p": _rec(True, 9.0, ratio=4.8)}
    out = merge_sweep(prior, fresh, FP)
    assert out["p"]["growth_ratio"] == 4.8


def test_unstamped_legacy_prior_always_loses():
    prior = {"p": {"growth_ratio": 1.0, "noisy": False,
                   "load_1m_per_measurement": {"1x": 0.1, "50x": 0.1}}}
    fresh = {"p": _rec(False, 3.0, ratio=2.2)}
    out = merge_sweep(prior, fresh, FP)
    assert out["p"]["growth_ratio"] == 2.2


def test_noisier_fresh_does_not_displace_quiet_prior_but_new_names_land():
    prior = {"p": _rec(False, 0.5, ratio=1.8)}
    fresh = {"p": _rec(True, 9.0, ratio=3.0), "q": _rec(False, 1.0, ratio=1.1)}
    out = merge_sweep(prior, fresh, FP)
    assert out["p"]["growth_ratio"] == 1.8
    assert out["q"]["growth_ratio"] == 1.1


def test_code_fingerprint_is_stable_and_code_sensitive(tmp_path, monkeypatch):
    """Same inputs -> same stamp; any package byte change -> new stamp."""
    import tools.scale_check as sc

    a = code_fingerprint()
    assert a == code_fingerprint() and len(a) == 16
    # point the walk at a synthetic package to prove content sensitivity
    pkg = tmp_path / "wordcount_spark"
    pkg.mkdir()
    (pkg / "m.py").write_text("x = 1\n")
    monkeypatch.setattr(sc, "_REPO_ROOT", str(tmp_path))
    b = code_fingerprint()
    (pkg / "m.py").write_text("x = 2\n")
    c = code_fingerprint()
    assert b != c and a != b
