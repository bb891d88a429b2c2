"""Mechanical enforcement: no raw ``.cache()`` in package source.

Query functions return lazy frames and cannot unpersist after the
consuming job, so raw ``.cache()`` pins accumulate in the block manager
over registry-wide sweeps (stability_check runs every query twice; the
driver sim runs all of them). ADVICE r3 flagged one instance; r4 closed
the class: every shared-frame pin goes through
``operators/caching.bounded_cache`` (session-wide FIFO, oldest evicted —
eviction just recomputes, never corrupts).
"""

from __future__ import annotations

import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "wordcount_spark")


def test_no_raw_cache_outside_caching_module():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py") or f == "caching.py":
                continue
            path = os.path.join(root, f)
            src = open(path).read()
            for i, line in enumerate(src.split("\n"), start=1):
                if ".cache()" in line.split("#")[0]:
                    offenders.append(f"{path}:{i}")
    assert not offenders, (
        "raw .cache() pins accumulate over long sessions — route through "
        f"operators/caching.bounded_cache instead: {offenders}"
    )
