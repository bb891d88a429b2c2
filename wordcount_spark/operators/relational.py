"""Relational operator building blocks shared by the registered queries.

The reference has NO joins/windows/rollups (SURVEY.md §2.7) — this module is
the extension surface re-expressed Spark-first on the TPC-H-ish star schema.

Oracle-parity conventions (driver hashes stringified values):

- Money arithmetic is done in DECIMAL: each double is cast to
  ``DECIMAL(18,2)`` *before* multiplying/summing, so results are exact and
  bit-identical between Spark and DuckDB regardless of partition/sum order.
  (Summing raw doubles is order-dependent — a different last-ulp per run.)
- Every computed column is aliased identically on both sides.
- Any LIMIT/top-k query orders by a UNIQUE key chain so the selected rowset
  is deterministic.

Scale notes: dimension tables (region/nation/supplier, and part at most
SFs) are broadcast — no shuffle of the fact table for those joins. Fact-fact
joins (lineitem⋈orders) shuffle on the join key; AQE coalesces/splits
post-shuffle partitions at runtime, which is the 100 TB-safe default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    """Exact 2-dp decimal view of a money double (see module docstring)."""
    return F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)


def stable_round(col: Column, digits: int) -> Column:
    """Engine-stable d-digit truncation for doubles that can land ON the
    rounding lattice (ratios of small integers: percent_rank, feature
    ratios). ``round()`` breaks ties differently per engine (Spark rounds
    the shortest decimal repr, DuckDB the exact binary value), so a value
    within an ulp of ``x.…5`` flips. floor() moves the hazard to INTEGER
    lattice points — which ratio data hits exactly — so a 1e-6 nudge
    shifts the boundary off the lattice: cross-engine ulp noise (~1e-12
    relative) cannot straddle it, and real values a full 1e-6 below an
    integer are not lattice points of ratio-valued data. ``+ 0.0``
    canonicalizes -0.0. SQL twin: ``floor(x * 1eD + 1e-6) / 1eD + 0.0``.
    """
    scale = float(10 ** digits)
    return F.floor(col * scale + 1e-6) / scale + 0.0


def stable_round_sql(expr: str, digits: int) -> str:
    """DuckDB rendering of ``stable_round`` (must stay textually parallel)."""
    scale = float(10 ** digits)
    return f"floor(({expr}) * {scale} + 1e-6) / {scale} + 0.0"


def dbl(col: Column | str) -> Column:
    """Canonical OUTPUT form of an exact decimal: cast to DOUBLE.

    Decimal stays internal (exact, order-independent sums); the output
    column must be DOUBLE because the driver's hasher coerces both engines
    through pandas — DuckDB DECIMAL becomes float64 (``"253942.0"``) while
    Spark DecimalType survives as ``decimal.Decimal`` (``"253942.00"``),
    so a DECIMAL-typed output hash-mismatches on trailing zeros. Casting
    the identical exact decimal to DOUBLE on both sides yields the same
    bits, hence the same string, under every coercion path. Mirror rule in
    oracle SQL: ``CAST(sum(...) AS DOUBLE)``."""
    return F.col(col).cast("double") if isinstance(col, str) else col.cast("double")
