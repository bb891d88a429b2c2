"""Golden cases for the word normalizer (FIXTURES.md §2, SURVEY.md §2.2).

Both semantics: HEAD sources (canonical) and stale committed binaries
(produced the reference's golden seq_out.txt / omp_out.txt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wordcount_spark.functions.text import normalize_word, tokenize

# (input, head_expected, stale_expected); None == dropped (empty after norm)
GOLDEN = [
    ("Hello,", "hello", "hello"),
    ("WORLD!!", "world", "world"),
    ("don't", "don't", "don't"),
    ("foo.bar.baz", "foo.bar.baz", "foo.bar.baz"),
    ("...dots...", "dots", "dots"),
    ("501(c)(3)", "501(c)(3", "501(c)(3"),
    ("_lead", "lead", "lead"),
    ("trail_", "trail", "trail"),
    ("under_score_", "under_score", "under_score"),
    ("“quoted”", "quoted", "“quoted”"),
    ("café", "caf", "café"),
    ("naïve", "naïve", "naïve"),
    ("e2—dash", "e2—dash", "e2—dash"),
    ("—", None, "—"),
    ("﻿the", "the", "﻿the"),
    ("NAÏVE", "naÏve", "naÏve"),
]


@pytest.mark.parametrize("mode,col", [("head", 1), ("stale", 2)])
def test_normalizer_golden(spark, mode, col):
    df = spark.createDataFrame([(g[0],) for g in GOLDEN], ["tok"])
    out = df.select("tok", normalize_word("tok", mode=mode).alias("norm")).collect()
    got = {r["tok"]: r["norm"] for r in out}
    for g in GOLDEN:
        expected = g[col] if g[col] is not None else ""
        assert got[g[0]] == expected, f"{mode}: {g[0]!r} -> {got[g[0]]!r}, want {expected!r}"


def test_tokenize_whitespace_set(spark):
    # C++ operator>> splits on space \t \n \v \f \r — Java \s matches exactly.
    df = spark.createDataFrame([("a b\tc\nd\x0be\ff\rg  h",)], ["text"])
    toks = df.select(tokenize("text").alias("t")).collect()[0]["t"]
    assert toks == ["a", "b", "c", "d", "e", "f", "g", "h"]


def test_tokenize_drops_edge_empties(spark):
    df = spark.createDataFrame([("  x  ", ""), (" ", "")], ["text", "pad"])
    rows = df.select(F.explode(tokenize("text")).alias("t")).collect()
    assert [r["t"] for r in rows] == ["x"]
