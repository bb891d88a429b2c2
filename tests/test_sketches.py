"""Misra-Gries two-pass heavy hitters: the superset guarantee must hold
under EVICTION (vocabulary ≫ capacity) and under any partitioning — the
registered query's corpus has a 31-word vocabulary that never evicts, so
this test builds a skewed synthetic stream that does."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordcount_spark.operators.sketches import misra_gries_candidates


def _skewed_tokens(spark, n_rows: int = 20_000, vocab: int = 2_000):
    """Zipf-ish stream: a handful of hot tokens (>1% each) over a long
    uniform tail of `vocab` distinct cold tokens."""
    base = spark.range(n_rows)
    # id % 7 < 2 → hot token h{id%5} (2/7 of the stream split over 5 hot
    # tokens ≈ 5.7% each); otherwise cold token c{id % vocab}.
    tok = F.when(
        F.col("id") % 7 < 2, F.concat(F.lit("h"), (F.col("id") % 5).cast("string"))
    ).otherwise(F.concat(F.lit("c"), (F.col("id") % vocab).cast("string")))
    return base.select(tok.alias("tok"))


def _exact_hh(toks, thr_div: int):
    total = toks.count()
    thr = total // thr_div
    rows = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    )
    return {(r["tok"], r["cnt"]) for r in rows}, thr


def _two_pass_hh(toks, capacity: int, thr: int):
    cand = misra_gries_candidates(toks, "tok", capacity).distinct()
    rows = (
        toks.join(cand, "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    )
    return {(r["tok"], r["cnt"]) for r in rows}


def test_eviction_actually_happens(spark):
    """Sanity: per-partition distinct count exceeds capacity, so the MG
    compress path runs (otherwise this file tests nothing)."""
    toks = _skewed_tokens(spark).repartition(4)
    per_part = (
        toks.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.countDistinct("tok").alias("nd"))
        .agg(F.min("nd"))
        .collect()[0][0]
    )
    assert per_part > 64, f"test data too small to force eviction: {per_part}"


def test_two_pass_matches_exact_under_eviction(spark):
    toks = _skewed_tokens(spark)
    exact, thr = _exact_hh(toks, 100)
    assert exact, "threshold too high — no heavy hitters to find"
    # hot tokens are ~5.7% each; cold tail ~0.05% — margin is wide
    got = _two_pass_hh(toks, capacity=128, thr=thr)
    assert got == exact


def test_partitioning_invariance(spark):
    """The per-partition summaries differ by partitioning; the recounted
    answer must not."""
    toks = _skewed_tokens(spark)
    exact, thr = _exact_hh(toks, 100)
    for parts in (1, 3, 16):
        got = _two_pass_hh(toks.repartition(parts), capacity=128, thr=thr)
        assert got == exact, f"answer changed under repartition({parts})"


def test_candidates_are_superset_not_exact(spark):
    """MG candidates may include false positives — the guarantee is
    superset-ness, and pass 2 is what removes them. Verify the direction:
    every exact HH is a candidate."""
    toks = _skewed_tokens(spark).repartition(4)
    exact, _ = _exact_hh(toks, 100)
    cand = {
        r["tok"] for r in misra_gries_candidates(toks, "tok", 128).distinct().collect()
    }
    assert {t for t, _ in exact} <= cand


# --- property tests on the pure fold (no SparkSession) ----------------------

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wordcount_spark.operators.sketches import mg_fold


@settings(max_examples=200, deadline=None)
@given(
    batches=st.lists(
        st.lists(st.integers(0, 60), min_size=0, max_size=300),
        min_size=0,
        max_size=8,
    ),
    capacity=st.integers(2, 24),
)
def test_mg_fold_superset_property(batches, capacity):
    """For ANY batch slicing and capacity: every key with true count
    STRICTLY above total/(capacity+1) must survive the fold (the superset
    guarantee pass 2 relies on), and the fold never keeps more than
    ``capacity`` counters, each undercounting by at most
    total/(capacity+1)."""
    truth = Counter(t for b in batches for t in b)
    total = sum(truth.values())
    acc = mg_fold(
        (pd.Series(b, dtype=object).value_counts() for b in batches), capacity
    )
    assert len(acc) <= capacity
    bound = total / (capacity + 1)
    survivors = set(acc.index)
    for key, cnt in truth.items():
        if cnt > bound:
            assert key in survivors, (
                f"heavy key {key} (count {cnt} > bound {bound:.1f}) evicted"
            )
    # per-key undercount bound: stored count is within [true - bound, true]
    for key, stored in acc.items():
        assert stored <= truth[key] + 1e-9
        assert stored >= truth[key] - bound - 1e-9


@settings(max_examples=100, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 40), min_size=0, max_size=600),
    capacity=st.integers(2, 16),
    cut=st.integers(0, 600),
)
def test_mg_fold_batch_slicing_superset_invariant(tokens, capacity, cut):
    """Slicing the same stream into different batch boundaries may change
    WHICH extra keys survive, but never loses a guaranteed-heavy key."""
    cut = min(cut, len(tokens))
    truth = Counter(tokens)
    total = len(tokens)
    bound = total / (capacity + 1)
    heavy = {k for k, c in truth.items() if c > bound}
    for slicing in ([tokens], [tokens[:cut], tokens[cut:]]):
        acc = mg_fold(
            (pd.Series(b, dtype=object).value_counts() for b in slicing), capacity
        )
        assert heavy <= set(acc.index)
