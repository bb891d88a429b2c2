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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40)
)
def test_pack_fragments_tile_property(spark, token_counts):
    """Property: for ANY doc-length profile, packing fragments (a) conserve
    each doc's token count, (b) fill every sequence to PACK_C except the
    last, (c) start at offset = running-total mod PACK_C."""
    from wordcount_spark.operators.queries_llmprep import PACK_C, pack_fragments

    rows = [
        (i, " ".join(["w"] * n) if n else "") for i, n in enumerate(token_counts)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    frags = pack_fragments(docs).collect()

    per_doc: dict[int, int] = {}
    per_seq: dict[int, int] = {}
    for r in frags:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_toks
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_toks
    assert per_doc == {
        i: n for i, n in enumerate(token_counts) if n > 0
    }
    if per_seq:
        last = max(per_seq)
        assert all(
            tot == PACK_C for s, tot in per_seq.items() if s != last
        )
        total = sum(token_counts)
        assert per_seq[last] == total - last * PACK_C
