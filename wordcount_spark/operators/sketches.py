"""Streaming-sketch operators: Misra-Gries heavy-hitter candidates.

Two-pass GUARANTEED heavy hitters (no approximation in the final answer):

* pass 1 streams every partition through a bounded Misra-Gries summary
  (``capacity`` counters, Arrow batch at a time). The mergeable-summary
  rule (Agarwal et al., "Mergeable Summaries", PODS'12) — add exact batch
  counts, then if more than ``capacity`` keys survive, subtract the
  (capacity+1)-th largest count from every counter and drop the non-
  positives — keeps the total undercount ≤ N_p/(capacity+1) per
  partition. Hence any token with partition frequency f_p >
  N_p/(capacity+1) still has a positive counter at partition end, and by
  pigeonhole any GLOBAL token with frequency ≥ φ·N appears with f_p ≥
  φ·N_p in at least one partition — so with capacity ≥ 1/φ the union of
  per-partition candidates is a SUPERSET of the φ-heavy tokens.
* pass 2 exactly recounts only the candidates (semi join + map-side
  combined groupBy) and applies the exact integer threshold, discarding
  the superset's false positives.

Scale: the raw token stream is never shuffled — pass 1 emits O(P ×
capacity) candidate rows, pass 2's exchange carries O(P × |candidates|)
partial-aggregate rows. At 100 TB this is the only viable exact-HH shape:
a direct groupBy(token) would shuffle the full stream. When n <
capacity·threshold the guarantee degrades, but then per-partition
distinct counts are ≤ capacity, no eviction happens, and the candidate
set is simply every token present — still a superset.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """One row per surviving Misra-Gries counter key per partition.

    The output is partitioning-DEPENDENT (it is a per-partition summary);
    only the pass-2 exact recount is partitioning-invariant. Callers must
    therefore never expose this frame directly as a query result.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, cnt in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > capacity:
                # mergeable-MG compress: subtract the (capacity+1)-th
                # largest count, drop non-positive counters.
                pivot = heapq.nlargest(capacity + 1, counters.values())[-1]
                counters = {k: v - pivot for k, v in counters.items() if v > pivot}
        yield pd.DataFrame({col: list(counters.keys())})

    return df.mapInPandas(summarize, schema=f"{col} string")
