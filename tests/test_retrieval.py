"""Semantic invariants for the retrieval + budget operators (the oracle
hash-check pins exact values; these pin the MEANING, so a same-on-both-
engines bug cannot hide)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wordcount_spark.registry import get_queries


@pytest.fixture(scope="module")
def queries():
    return get_queries()


def test_bm25_ranks_contiguous_and_docs_match_terms(spark, queries):
    from wordcount_spark.operators.queries_retrieval import QUERY_TERMS, TOPK

    rows = queries["retrieval_bm25_topk"](spark, SF_DIR).collect()
    by_qid: dict[int, list] = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == set(QUERY_TERMS)
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for qid, rs in by_qid.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= TOPK
        # scores positive and non-increasing by rank
        ordered = sorted(rs, key=lambda r: r["rank"])
        scores = [r["score"] for r in ordered]
        assert all(s > 0 for s in scores)
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        # every returned doc contains at least one query term
        for r in rs:
            assert any(t in docs[r["doc_id"]] for t in QUERY_TERMS[qid])


def test_rrf_score_consistent_with_ranks(spark, queries):
    from wordcount_spark.operators.queries_retrieval import RRF_K

    import math

    rows = queries["retrieval_hybrid_rrf"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        raw = (1.0 / (RRF_K + r["bm25_rank"]) if r["bm25_rank"] else 0.0) + (
            1.0 / (RRF_K + r["cos_rank"]) if r["cos_rank"] else 0.0
        )
        # mirror stable_round (ADVICE r2: a rounded ratio-sum is the exact
        # lattice class plain round() tie-breaks differently per engine)
        want = math.floor(raw * 1e6 + 1e-6) / 1e6 + 0.0
        assert abs(r["rrf_score"] - want) < 1e-9, r
        assert r["bm25_rank"] > 0 or r["cos_rank"] > 0


def test_waterfill_budget_and_fairness(spark, queries):
    from wordcount_spark.operators.queries_llmprep import BUDGET_FRAC

    rows = queries["mix_token_budget_waterfill"](spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    budget = int(BUDGET_FRAC * total)
    allocs = sum(r["alloc_tokens"] for r in rows)
    # budget respected, with slack < one token per capped source (floor)
    n_capped = sum(1 for r in rows if not r["fully_kept"])
    assert allocs <= budget
    assert budget - allocs <= max(n_capped, 1)
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["n_tokens"]
        assert r["fully_kept"] == (r["alloc_tokens"] == r["n_tokens"]) or not r[
            "fully_kept"
        ]
    # max-min fairness: every capped source gets the SAME level
    caps = {r["alloc_tokens"] for r in rows if not r["fully_kept"]}
    assert len(caps) <= 1
    # and no kept source is larger than the cap level
    if caps:
        (cap,) = caps
        assert all(r["n_tokens"] <= cap for r in rows if r["fully_kept"])


def test_snapshot_diff_partitions_the_union(spark, queries):
    rows = queries["corpus_snapshot_diff"](spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_source_union = {
        r["source"]: r["n"]
        for r in docs.where("doc_id % 10 < 8 OR doc_id % 10 >= 2")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        classes = r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
        assert classes == per_source_union[r["source"]]
        # the deterministic carve guarantees every class is exercised
        # somewhere; per-source each must be non-negative
        assert min(r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) >= 0
    assert sum(r["n_changed"] for r in rows) > 0
    assert sum(r["n_added"] for r in rows) > 0
    assert sum(r["n_removed"] for r in rows) > 0


def test_bm25_matches_independent_python_implementation(spark, queries):
    """The SQL oracle shares the scoring formula with the Spark plan, so a
    wrong formula would pass the differential check. This pins the scores
    against an INDEPENDENT from-the-paper BM25 (Robertson/Sparck Jones,
    k1=1.2 b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)) computed in plain
    Python over the same corpus."""
    import math
    from collections import Counter

    from wordcount_spark.operators.queries_retrieval import (
        B,
        K1,
        QUERY_TERMS,
        TOPK,
    )

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    N = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / N
    tfs = {d: Counter(t) for d, t in docs.items()}

    def bm25(qid):
        scores = {}
        for term in QUERY_TERMS[qid]:
            df = sum(1 for c in tfs.values() if c[term] > 0)
            if df == 0:
                continue
            idf = round(math.log((N - df + 0.5) / (df + 0.5) + 1.0), 4)
            for d, c in tfs.items():
                tf = c[term]
                if tf == 0:
                    continue
                dl = len(docs[d])
                contrib = round(
                    idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl)), 6
                )
                scores[d] = scores.get(d, 0.0) + contrib
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK]
        return [(d, round(s, 6)) for d, s in top]

    got = {}
    for r in queries["retrieval_bm25_topk"](spark, SF_DIR).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid in QUERY_TERMS:
        want = bm25(qid)
        rows = sorted(got[qid])
        assert len(rows) == len(want)
        for (rank, doc_id, score), (wd, ws) in zip(rows, want):
            assert doc_id == wd, (qid, rank, doc_id, wd)
            assert abs(score - ws) < 1e-6, (qid, doc_id, score, ws)
