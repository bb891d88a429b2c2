"""Metrics side-channel — the reference prints stage timings to stderr
(``omp.cpp:227-230``, ``hybrid.cpp:459-463``); the Spark-native equivalent
is the Observation API: named aggregates computed DURING the query (no
second pass, no extra action) plus wall-clock around the action.
"""

from __future__ import annotations

import sys
import time
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach an Observation counting rows + bytes-ish volume in-flight."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def run_with_metrics(df: DataFrame, label: str = "query") -> dict[str, Any]:
    """Execute ``df`` (noop sink) and report {label, rows, wall_s} to stderr
    — the reference's timing side-channel, one query pass."""
    observed_df, obs = observed(df)
    t0 = time.monotonic()
    observed_df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    metrics = {"label": label, "wall_s": round(wall, 4), **obs.get}
    print(f"[metrics] {metrics}", file=sys.stderr)
    return metrics
