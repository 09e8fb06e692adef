"""Skew sweep: run the WHOLE query suite + DuckDB twins against a
corpus whose join/group keys all collapse onto ONE hot key — the
adversarial direction opposite to ``hostile_sweep`` (there: buckets
empty; here: one bucket holds everything).

What it checks: every bucketed fold, salting path, heap, and
politeness structure must stay CORRECT (value-parity vs the twin) when
a single key carries the whole table — the 100 TB skew story is first
a correctness property, then a performance one. Catches the complement
of the empty-bucket class: quadratic blowups guarded by size gates,
per-bucket kernels assuming multiple groups, tie-breaks that only ever
saw distinct keys.

Skew rewrites (schemas unchanged):
- events.user_id      -> all the same user (one session owns the table)
- orders.o_custkey    -> all the same customer
- lineitem.l_suppkey  -> all the same supplier
- documents.source    -> all one source; lang -> one lang
- embeddings.label    -> all one label

Usage: python tools/skew_sweep.py [name ...]
Exit 0 iff every checked query is green (check_oracles' gate).
"""

from __future__ import annotations

import sys

from _sweep_common import build_corpus, const_col, run_gate


def _rewrite(name, t):
    if t.num_rows == 0:
        return t
    if name == "events":
        t = const_col(t, "user_id", t["user_id"][0].as_py())
    elif name == "orders":
        t = const_col(t, "o_custkey", t["o_custkey"][0].as_py())
    elif name == "lineitem":
        t = const_col(t, "l_suppkey", t["l_suppkey"][0].as_py())
    elif name == "documents":
        t = const_col(t, "source", t["source"][0].as_py())
        t = const_col(t, "lang", t["lang"][0].as_py())
    elif name == "embeddings":
        t = const_col(t, "label", t["label"][0].as_py())
    return t


if __name__ == "__main__":
    dst = build_corpus("/tmp/sf_skew", _rewrite)
    raise SystemExit(run_gate(dst, sys.argv[1:]))
