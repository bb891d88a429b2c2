"""Property test: the Spark chunker (sequence+posexplode+slice) must agree
with an independent Python model on arbitrary documents — window/stride
boundary cases (n < W, n exactly a stride multiple, single token) are the
places a 1-based/0-based slice disagreement would hide. Exercises the
REAL operator expression (queries_llmprep.chunk_windows), not a copy."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from wordcount_spark.operators.queries_llmprep import CHUNK_S, CHUNK_W, chunk_windows

# whitespace-free tokens; docs as token lists so the model owns the joins
token_st = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=8,
)
doc_st = st.lists(token_st, min_size=1, max_size=3 * CHUNK_W + 3)


def model_chunks(toks: list[str]) -> list[tuple[int, int, int, str]]:
    """(chunk_idx, start, n_tokens, md5) for windows of CHUNK_W every CHUNK_S."""
    out = []
    for idx, start in enumerate(range(0, len(toks), CHUNK_S)):
        window = toks[start : start + CHUNK_W]
        out.append(
            (
                idx,
                start,
                len(window),
                hashlib.md5(" ".join(window).encode()).hexdigest(),
            )
        )
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=4))
def test_chunker_matches_model(spark, docs):
    from pyspark.sql import functions as F

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    got = chunk_windows(df.select("doc_id", toks.alias("toks"))).collect()
    got_set = {
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tokens_chunk"], r["chunk_md5"])
        for r in got
    }
    want = {
        (i, idx, start, nt, h)
        for i, toks_list in enumerate(docs)
        for (idx, start, nt, h) in model_chunks(toks_list)
    }
    assert got_set == want
