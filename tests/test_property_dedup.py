"""Property-based testing of the dedup primitives: the zip-with-shifted-
slices shingle expression and the array-fold minhash must agree with
independent Python models on arbitrary generated texts — the fold/slice
algebra has off-by-one corners (docs shorter than n, repeated tokens,
exotic whitespace) that golden fixtures can't enumerate."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from wordcount_spark.operators.dedup import (
    _P,
    _affine_params,
    shingle_array,
)

_WS = " \t\n\x0b\f\r"

# documents: tokens + whitespace runs, including empty and whitespace-only
text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=122),
    min_size=0,
    max_size=120,
)


def model_shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


@settings(max_examples=10, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=30))
def test_shingle_array_matches_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r.i: sorted(r.sh)
        for r in df.select("i", shingle_array("text").alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == model_shingles(t), f"text={t!r}"


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=40))
def test_affine_fold_is_elementwise_min(spark, raw_hashes):
    """The signature fold (elementwise-min of affine values) must equal the
    naive per-hash min — on arbitrary int64 hash inputs, folded in [0, P)."""
    params = _affine_params(8)
    hashes = [(h % _P + _P) % _P for h in raw_hashes]
    expect = [min((a * x + b) % _P for x in hashes) for (a, b) in params]

    df = spark.createDataFrame([(hashes,)], ["hs"])

    def step(acc, x):
        affines = F.array(*[(x * a + b) % _P for (a, b) in params])
        return F.zip_with(acc, affines, lambda p, q: F.least(p, q))

    sig = F.aggregate(
        "hs", F.array_repeat(F.lit(_P).cast("long"), 8), step
    )
    got = df.select(sig.alias("sig")).collect()[0].sig
    assert got == expect
