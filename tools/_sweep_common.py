"""Shared machinery for the adversarial-corpus sweeps
(``hostile_sweep`` / ``skew_sweep``): build a rewritten copy of the
sf0.001 corpus and run the full ``check_oracles`` gate on it.

``build_corpus(dst, rewrite)`` wipes any stale parquet in ``dst``
first (a prior run against a different source must never leave orphan
tables in the corpus the sweep claims to be testing), then writes each
table through the per-table ``rewrite(name, table) -> table`` hook.
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = "/root/testdata/sf0.001"


def const_col(t, col: str, value):
    import pyarrow as pa

    i = t.column_names.index(col)
    arr = pa.array([value] * t.num_rows, t.schema.field(col).type)
    return t.set_column(i, col, arr)


def build_corpus(dst: str, rewrite) -> str:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for stale in os.listdir(dst):
        if stale.endswith(".parquet"):
            os.unlink(os.path.join(dst, stale))
    for f in os.listdir(SRC):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SRC, f))
        t = rewrite(f[: -len(".parquet")], t)
        pq.write_table(t, os.path.join(dst, f))
    return dst


def run_gate(dst: str, extra_args: list[str]) -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "check_oracles.py"), dst, *extra_args],
        cwd=os.path.dirname(here),
    )
    return proc.returncode
