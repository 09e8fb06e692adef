"""Hostile-predicate sweep: run the WHOLE query suite (including the
DuckDB twins) against a corpus whose rows are valid but chosen so the
common filter predicates match NOTHING — the data-dependent sibling of
``empty_sweep``.

Why it exists: ``empty_sweep`` feeds zero-row TABLES, so stages never
see a batch at all. In production the dangerous case is a NON-empty
table whose batches filter to zero rows inside a stage (e.g. an orders
block with no URGENT/HIGH rows) — exactly the class the round-5 review
caught crashing numpy first-of-run masks (IndexError on boolean-index
length mismatch). This sweep synthesizes that shape for every common
predicate at once and then runs ``check_oracles`` on it, so both
crash-freedom AND value parity vs the twins are checked on the hostile
corpus.

Hostile rewrites (schemas unchanged, one value per predicate family):
- orders.o_orderpriority      -> all '5-LOW'   (URGENT/HIGH filters)
- orders.o_orderstatus        -> all 'P'
- lineitem.l_returnflag       -> all 'N'       (returned-item filters)
- lineitem.l_quantity         -> all 25        (small/large-qty bands)
- customer.c_mktsegment       -> all 'FURNITURE'
- part.p_brand/p_type         -> constants     (brand/type filters)
- events.event_type           -> all 'view'    (funnel click/purchase)
- documents.text              -> every 3rd doc empty, rest one short
  token line (quality gates, shingle windows shorter than 20 chars)

Usage: python tools/hostile_sweep.py [name ...]
Exit 0 iff every checked query is green (check_oracles' own gate).
"""

from __future__ import annotations

import sys

from _sweep_common import build_corpus, const_col, run_gate


def _rewrite(name, t):
    import numpy as np
    import pyarrow as pa

    if name == "orders":
        t = const_col(t, "o_orderpriority", "5-LOW")
        t = const_col(t, "o_orderstatus", "P")
    elif name == "lineitem":
        t = const_col(t, "l_returnflag", "N")
        t = const_col(t, "l_quantity", 25.0)
    elif name == "customer":
        t = const_col(t, "c_mktsegment", "FURNITURE")
    elif name == "part":
        t = const_col(t, "p_brand", "Brand#55")
        t = const_col(t, "p_type", "HOSTILE PLATED TIN")
    elif name == "events":
        t = const_col(t, "event_type", "view")
    elif name == "documents":
        texts = ["" if i % 3 == 0 else "tok" for i in range(t.num_rows)]
        t = t.set_column(t.column_names.index("text"), "text", pa.array(texts))
        if "n_chars" in t.column_names:
            t = t.set_column(
                t.column_names.index("n_chars"),
                "n_chars",
                pa.array(
                    np.array([len(x) for x in texts], np.int64),
                    t.schema.field("n_chars").type,
                ),
            )
    return t


if __name__ == "__main__":
    dst = build_corpus("/tmp/sf_hostile", _rewrite)
    raise SystemExit(run_gate(dst, sys.argv[1:]))
