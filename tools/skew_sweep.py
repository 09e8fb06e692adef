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

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_skew_corpus(dst: str = "/tmp/sf_skew") -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    os.makedirs(dst, exist_ok=True)

    def const(t: pa.Table, col: str, value) -> pa.Table:
        i = t.column_names.index(col)
        arr = pa.array([value] * t.num_rows, t.schema.field(col).type)
        return t.set_column(i, col, arr)

    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f))
        name = f[: -len(".parquet")]
        if name == "events" and t.num_rows:
            t = const(t, "user_id", t["user_id"][0].as_py())
        elif name == "orders" and t.num_rows:
            t = const(t, "o_custkey", t["o_custkey"][0].as_py())
        elif name == "lineitem" and t.num_rows:
            t = const(t, "l_suppkey", t["l_suppkey"][0].as_py())
        elif name == "documents" and t.num_rows:
            t = const(t, "source", t["source"][0].as_py())
            t = const(t, "lang", t["lang"][0].as_py())
        elif name == "embeddings" and t.num_rows:
            t = const(t, "label", t["label"][0].as_py())
        pq.write_table(t, os.path.join(dst, f))
    return dst


def main() -> int:
    dst = make_skew_corpus()
    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "check_oracles.py"), dst, *sys.argv[1:]],
        cwd=os.path.dirname(here),
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
