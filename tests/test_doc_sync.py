"""Docs-vs-code sync: the catalogue counts ARCHITECTURE.md advertises
must equal the live registry, and every oracle key must have a query
(the driver contract)."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _entry():
    import __ray_entry__ as e

    return e


def test_architecture_counts_match_registry():
    e = _entry()
    nq, no = len(e.queries()), len(e.oracle_sql())
    text = open(os.path.join(REPO, "ARCHITECTURE.md")).read()
    m = re.search(
        r"runnable catalogue: (\d+) queries, (\d+) with DuckDB SQL oracles",
        text,
    )
    assert m, "ARCHITECTURE.md lost its catalogue-count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (nq, no), (
        f"ARCHITECTURE.md says {m.group(1)}/{m.group(2)} but the live "
        f"registry has {nq}/{no} — update the doc (or the registry)"
    )


def test_every_oracle_has_a_query():
    e = _entry()
    q, o = set(e.queries()), set(e.oracle_sql())
    assert o <= q, f"oracle keys without a query: {sorted(o - q)}"


def test_rows_only_queries_are_annotated():
    """Each query without an oracle is a deliberate rows-only entry —
    the registry should mark it (comment) and the count in
    ARCHITECTURE.md's rows-only enumeration should match."""
    e = _entry()
    rows_only = set(e.queries()) - set(e.oracle_sql())
    text = open(os.path.join(REPO, "ARCHITECTURE.md")).read()
    m = re.search(r"\(the (\d+)\s*\nrows-only entries", text)
    assert m, "ARCHITECTURE.md lost the rows-only enumeration"
    assert int(m.group(1)) == len(rows_only), (
        f"rows-only count drift: doc says {m.group(1)}, registry has "
        f"{len(rows_only)}: {sorted(rows_only)}"
    )
