"""CDC / upsert operators — MERGE INTO semantics without a table format.

Delta/Iceberg provide transactional MERGE; their jars aren't in this
container. The relational core of merge is engine-independent though, and
at 100 TB it is exactly these two plans:

- ``merge_upsert``: latest-wins apply of a changeset onto a snapshot
  (anti-join + union; the anti-join probe is the key-pruned changeset,
  broadcastable when the changeset is small, which is the common CDC
  case — and the formulation stays correct for duplicate-key targets).
- ``scd2_apply``: slowly-changing-dimension type 2 — close out changed
  rows with an end timestamp, append new versions (history preserved) —
  as a single left join + conditional-array explode, since Spark does
  not reuse exchanges across union branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Rows of ``changes`` replace same-key rows of ``target``; unmatched
    change rows insert. Schemas must match. Correct even when the target
    carries duplicate keys (all of them are replaced by the change rows,
    exactly once — a full-outer coalesce formulation would instead fan the
    change row out per duplicate, so it is deliberately NOT used here).

    Plan: the big (target) side is read and shuffled once; only the small
    changeset's lineage appears in both branches (column-pruned to the key
    in the anti-join) — the acceptable side of the no-exchange-reuse-
    across-branches rule."""
    kept = target.join(changes.select(key), key, "left_anti")
    return kept.unionByName(changes)


def merge_upsert_latest(
    target: DataFrame, changes: DataFrame, key: str, version_col: str
) -> DataFrame:
    """Like merge_upsert but the changeset may carry several versions per
    key: the highest ``version_col`` wins (window top-1 per key first)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.desc(version_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return merge_upsert(target, latest, key)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    compare_cols: list[str],
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """SCD2: for keys whose ``compare_cols`` changed, close the current row
    (set ``end_col`` to the change's ``ts_col``) and append the new
    version with an open end. Unchanged keys pass through. Assumes ≤ 1
    change row per key (pre-aggregate multi-version batches first, e.g.
    with the ``merge_upsert_latest`` window).

    Single-pass plan: ONE left join of current rows to changes, then each
    key emits its output rows from a conditional array + explode —
    unchanged/unmatched keys yield [current], changed keys yield
    [closed, new]. The earlier 4-branch union formulation re-planned (and
    re-shuffled) the current/changed frames once per branch — Spark does
    not reuse exchanges across union branches with distinct attribute
    ids, so at scale that read the changelog ~4×; this form reads and
    shuffles each side exactly once."""
    cur = dim.filter(F.col(end_col).isNull())
    closed_already = dim.filter(F.col(end_col).isNotNull())
    c, n = cur.alias("__c"), changes.alias("__n")
    joined = c.join(n, F.col(f"__c.{key}") == F.col(f"__n.{key}"), "left")
    cmp_cond = F.lit(False)
    for col in compare_cols:
        cmp_cond = cmp_cond | (F.col(f"__c.{col}") != F.col(f"__n.{col}"))
    # null-safe: no change row, or no compare col strictly differing → keep
    changed = F.coalesce(cmp_cond, F.lit(False))
    cur_row = F.struct(*[F.col(f"__c.{col}").alias(col) for col in dim.columns])
    closing_row = F.struct(
        *[
            (
                F.col(f"__n.{ts_col}").alias(col)
                if col == end_col
                else F.col(f"__c.{col}").alias(col)
            )
            for col in dim.columns
        ]
    )
    end_type = dict(dim.dtypes)[end_col]
    new_row = F.struct(
        *[
            (
                F.lit(None).cast(end_type).alias(col)
                if col == end_col
                else F.col(f"__n.{col}").alias(col)
                if col in changes.columns
                else F.col(f"__c.{col}").alias(col)
            )
            for col in dim.columns
        ]
    )
    rows = F.when(changed, F.array(closing_row, new_row)).otherwise(
        F.array(cur_row)
    )
    applied = joined.select(F.explode(rows).alias("__r")).select("__r.*")
    return closed_already.unionByName(applied)
