"""Session-wide bounded cache pinning.

Query functions cache shared sub-frames (a tokenized corpus consumed by
two branches, an O(groups) count table read twice) because Spark does not
reuse exchanges across DataFrame branches. Each ``.cache()`` pins blocks
in the block manager until explicitly unpersisted — and query functions
return lazy frames, so they cannot unpersist after the consuming job.
Long sessions that invoke many queries (stability_check runs every
registered query twice; the driver sim runs all of them) would accumulate
pins without bound (ADVICE r3 flagged the LSH instance; this closes the
class).

``bounded_cache`` keeps a global FIFO of live pins capped at
:data:`PIN_MAX`; inserting past the cap unpersists the oldest pin.
Evicting is ALWAYS safe: an evicted frame that is re-executed later just
recomputes its lineage (correctness is unaffected — only the reuse
speed-up is lost, and only for a frame at least PIN_MAX queries old).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: max frames pinned at once, session-wide. Individual queries pin ≤ 5
#: frames, so 32 slots keep every frame of the last ~6+ queries warm
#: while bounding block-manager growth over registry-wide sweeps.
PIN_MAX = 32

_pins: list[DataFrame] = []


def bounded_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with session-wide bounded pinning (oldest evicted)."""
    df = df.cache()
    _pins.append(df)
    while len(_pins) > PIN_MAX:
        try:
            _pins.pop(0).unpersist()
        except Exception:
            pass  # session already stopped / frame already unpersisted
    return df
