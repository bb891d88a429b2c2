"""CDC / upsert operators — MERGE INTO semantics without a table format.

Delta/Iceberg provide transactional MERGE; their jars aren't in this
container. The relational core of merge is engine-independent though, and
at 100 TB it is exactly these two plans:

- ``merge_upsert``: latest-wins apply of a changeset onto a snapshot
  (one anti-join + union — both shuffle on the key, broadcastable when
  the changeset is small, which is the common CDC case).
- ``scd2_apply``: slowly-changing-dimension type 2 — close out changed
  rows with an end timestamp, append new versions (history preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Rows of ``changes`` replace same-key rows of ``target``; unmatched
    change rows insert. Schemas must match."""
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
    version with an open end. Unchanged keys pass through."""
    cur = dim.filter(F.col(end_col).isNull())
    closed_already = dim.filter(F.col(end_col).isNotNull())
    cmp_cond = F.lit(False)
    for c in compare_cols:
        cmp_cond = cmp_cond | (cur[c] != changes[c])
    changed = cur.join(changes, cur[key] == changes[key]).filter(cmp_cond)
    closing = changed.select(
        *[cur[c] for c in dim.columns if c != end_col],
        changes[ts_col].alias(end_col),
    )
    new_versions = changed.select(
        *[changes[c] if c in changes.columns else cur[c] for c in dim.columns]
    ).withColumn(end_col, F.lit(None).cast(dict(dim.dtypes)[end_col]))
    unchanged_keys = cur.join(changed.select(cur[key]), key, "left_anti")
    return closed_already.unionByName(unchanged_keys).unionByName(closing).unionByName(
        new_versions
    )
