"""Mechanical guard for the r5 composite-pipeline invariant: document
TEXT (and raw token arrays) must never cross an Exchange. Shipping text
bytes through a shuffle is the single largest avoidable cost of a
curation pipeline at 100 TB — survivor ownership, sampling and chunk
filtering all operate on hashes and ids, so any text column appearing
in an Exchange's input is a plan regression, not a tuning choice.

The formatted physical plan lists each node's ``Input [..]`` columns;
this test walks every Exchange section of the guarded queries' plans
and asserts no text-carrying column is present.
"""

from __future__ import annotations

import re

import pytest

from wordcount_spark.plans.explain import formatted_plan

#: queries whose plans must never exchange text/token-array columns.
#: (line dedup ships 15-token "line" strings only map-side; its one
#: exchange carries the 128-bit hash pair.)
GUARDED = [
    "pipeline_pretrain_full",
    "pipeline_rag_corpus",
    "text_line_dedup_c4",
    "dedup_exact",
    "dedup_exact_survivors",
]

#: column-name prefixes that mean "corpus-sized text payload". Hash /
#: id / length columns derived FROM text are exactly what should cross.
TEXT_COLS = re.compile(r"\b(text|toks|line|scrubbed)#\d+", re.IGNORECASE)


def _exchange_sections(plan: str) -> list[str]:
    """The '(N) Exchange ...' detail sections of a formatted plan (each
    runs until the next '(M) <Node>' header)."""
    sections = re.split(r"\n(?=\(\d+\) )", plan)
    return [s for s in sections if s.startswith("(") and " Exchange" in s.split("\n")[0]]


@pytest.mark.parametrize("name", GUARDED)
def test_no_text_column_crosses_an_exchange(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    plan = formatted_plan(df)
    sections = _exchange_sections(plan)
    # non-vacuity: every guarded pipeline HAS exchanges (its dedup/agg
    # stages); zero sections would mean the parser broke, not that the
    # plan is shuffle-free (verified against the old window-over-
    # md5(text) shape, which this scan flags with exactly one hit)
    assert sections, f"{name}: no Exchange sections parsed — scan broken?"
    offenders = []
    for sec in sections:
        for line in sec.split("\n"):
            if line.strip().startswith(("Input", "Arguments")) and TEXT_COLS.search(line):
                offenders.append(sec.split("\n")[0] + " :: " + line.strip()[:120])
    assert not offenders, (
        f"{name}: text-carrying column crosses an exchange —\n" + "\n".join(offenders)
    )
