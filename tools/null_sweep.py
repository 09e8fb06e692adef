"""Null sweep: run the whole query suite + DuckDB twins against a
corpus with NULLs planted in the nullable text-adjacent columns
(documents.text / lang / source) — the third adversarial axis after
``hostile_sweep`` (predicates match nothing) and ``skew_sweep`` (one
hot key).

Why: the round-5 curation-family review found four null-handling
divergences (stratified sampling silently dropping the NULL stratum,
mix_domains crashing on a null source, split_by_group folding nulls
into the '' bucket, line explode crashing on null text) that no
existing sweep exercised — empty/hostile corpora have values
everywhere. This sweep makes engine-vs-twin null conventions a
mechanically checked contract across all registered queries.

Keys (doc_id etc.) stay non-null — null JOIN keys are a different
semantic contract (SQL null-never-matches) the twins don't model.

Usage: python tools/null_sweep.py [name ...]
Exit 0 iff every checked query is green (check_oracles' gate).
"""

from __future__ import annotations

import sys

from _sweep_common import build_corpus, run_gate


def _rewrite(name, t):
    import pyarrow as pa

    if name != "documents" or t.num_rows == 0:
        return t

    def with_nulls(col_name: str, every: int) -> pa.Array:
        vals = t[col_name].to_pylist()
        out = [None if i % every == 0 else v for i, v in enumerate(vals)]
        return pa.array(out, t.schema.field(col_name).type)

    t = t.set_column(t.column_names.index("text"), "text", with_nulls("text", 7))
    t = t.set_column(t.column_names.index("lang"), "lang", with_nulls("lang", 5))
    t = t.set_column(
        t.column_names.index("source"), "source", with_nulls("source", 6)
    )
    return t


if __name__ == "__main__":
    dst = build_corpus("/tmp/sf_null", _rewrite)
    raise SystemExit(run_gate(dst, sys.argv[1:]))
