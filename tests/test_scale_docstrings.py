"""Mechanical guard for the CLAUDE.md convention that every operator
docstring carries its scale argument (what shuffles, what broadcasts,
what the state/replication bound is). A registered query whose own
docstring says nothing about its distributed shape is unreviewable at
100 TB — this test makes the omission un-mergeable, the same pattern as
tests/test_broadcast_hints.py for hints."""

from __future__ import annotations

import inspect
import re

#: at least one of these must appear in the query function's docstring —
#: the vocabulary the repo's scale arguments are written in
SCALE_PAT = re.compile(
    r"scale|shuffle|exchange|broadcast|map-only|codegen|narrow|partition"
    r"|one pass|single pass|pushdown|pushed|driver|skew|O\(",
    re.I,
)


def test_every_registered_query_documents_its_scale():
    from wordcount_spark.registry import get_queries

    missing = []
    for name, fn in get_queries().items():
        doc = inspect.getdoc(fn) or ""
        if not SCALE_PAT.search(doc):
            missing.append(name)
    assert not missing, (
        "registered queries whose docstring carries no scale argument "
        f"(say what shuffles/broadcasts/bounds state): {missing}"
    )
