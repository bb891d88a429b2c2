"""Mechanical guard, registry-wide: document TEXT (and raw token
arrays) must never cross a HASH/RANGE exchange. Shipping text bytes
through a shuffle is the single largest avoidable cost of a curation
pipeline at 100 TB — survivor ownership, sampling and chunk filtering
all operate on hashes and ids, so a text column in an Exchange's input
is a plan regression, not a tuning choice (r5 caught and fixed exactly
this in both flagship composites).

One shape is allowed: ``RoundRobinPartitioning`` from
`operators/wordcount._fan_out_if_narrow` — a SIZE-GATED rebalance of an
under-parallel scan (fewer partitions than half the slots) that is a
no-op at any real corpus size and exists so a single small file uses
every core. Hash/range exchanges get no such pass.

The formatted physical plan lists each node's ``Input [..]`` columns;
this test walks every Exchange section of every non-eager registered
query and fails on a text-carrying hash/range exchange.
"""

from __future__ import annotations

import re

from wordcount_spark.plans.explain import formatted_plan
from wordcount_spark.registry import EAGER_QUERIES

#: column-name prefixes that mean "corpus-sized text payload". Hash /
#: id / length columns derived FROM text are exactly what should cross.
TEXT_COLS = re.compile(r"\b(text|toks|line|scrubbed)#\d+", re.IGNORECASE)


def _exchange_sections(plan: str) -> list[str]:
    """The '(N) Exchange ...' detail sections of a formatted plan (each
    runs until the next '(M) <Node>' header)."""
    sections = re.split(r"\n(?=\(\d+\) )", plan)
    return [s for s in sections if s.startswith("(") and " Exchange" in s.split("\n")[0]]


def _text_offenders(plan: str) -> list[str]:
    offenders = []
    for sec in _exchange_sections(plan):
        lines = sec.split("\n")
        if any("RoundRobinPartitioning" in ln for ln in lines):
            continue  # the gated _fan_out_if_narrow rebalance (see module doc)
        for line in lines:
            if line.strip().startswith(("Input", "Arguments")) and TEXT_COLS.search(line):
                offenders.append(lines[0] + " :: " + line.strip()[:120])
    return offenders


def test_no_text_column_crosses_a_hash_exchange_anywhere(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    bad: dict[str, list[str]] = {}
    parsed_sections = 0
    for name, fn in sorted(qs.items()):
        if name in EAGER_QUERIES:
            continue
        plan = formatted_plan(fn(spark, sf_dir))
        parsed_sections += len(_exchange_sections(plan))
        offenders = _text_offenders(plan)
        if offenders:
            bad[name] = offenders
    # non-vacuity: the registry's plans contain hundreds of exchanges;
    # ~zero parsed would mean the section parser broke, not that every
    # plan is shuffle-free (the scan is verified sensitive against the
    # old window-over-md5(text) dedup shape)
    assert parsed_sections > 100, f"only {parsed_sections} Exchange sections parsed"
    assert not bad, "text-carrying columns cross hash/range exchanges:\n" + "\n".join(
        f"{k}: {v[0]}" for k, v in bad.items()
    )


def test_pretrain_pre_checkpoint_survivor_plan_is_text_free(spark, sf_dir):
    """ADVICE r6: `pipeline_pretrain_full` localCheckpoint()s its
    survivor-id table at build time, truncating lineage — the registry-
    wide scan above therefore never sees the survivor aggregation's
    sub-plan, and a text/token-array shuffle introduced upstream of the
    checkpoint would be invisible to it. Inspect the PRE-checkpoint
    frame directly through the shared helper the query itself builds
    from."""
    from wordcount_spark.operators.queries_llmprep import (
        _pretrain_quality_docs,
        pretrain_survivor_ids_plan,
    )
    from wordcount_spark.sources.readers import load_table

    q = _pretrain_quality_docs(load_table(spark, sf_dir, "documents"))
    plan = formatted_plan(pretrain_survivor_ids_plan(q))
    sections = _exchange_sections(plan)
    assert sections, "survivor plan lost its aggregation exchange entirely"
    offenders = _text_offenders(plan)
    assert not offenders, (
        "text/token columns cross the pre-checkpoint survivor exchange:\n"
        + "\n".join(offenders)
    )
