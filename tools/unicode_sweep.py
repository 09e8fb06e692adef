"""Unicode sweep: run the whole query suite + DuckDB twins against a
corpus whose document text is saturated with multibyte codepoints
(2/3/4-byte UTF-8, combining marks, RTL) — checking that the engine's
codepoint-based kernels (utf-32 window hashing, ``utf8_length`` token
counts, offsets-based string rebuilds) agree with DuckDB's string
semantics (``length``/``substr`` are codepoint-based there too) on
text where bytes ≠ chars everywhere.

Rewrite: every document's ASCII words are interleaved with a rotating
multibyte vocabulary; ~1/5 of docs get a fully multibyte line, others
keep mixed content so dedup families still find structure.

Usage: python tools/unicode_sweep.py [name ...]
Exit 0 iff every checked query is green (check_oracles' gate).
"""

from __future__ import annotations

import sys

from _sweep_common import build_corpus, run_gate

_WORDS = [
    "héllo", "wörld", "ünïfied", "κόσμος", "мир", "世界", "ことば",
    "🌍🌎", "𝄞note", "naïve", "mañana", "שלום", "عالم", "t́ap",
]


def _rewrite(name, t):
    import numpy as np
    import pyarrow as pa

    if name != "documents" or t.num_rows == 0:
        return t
    texts = t["text"].to_pylist()
    out = []
    for i, txt in enumerate(texts):
        toks = (txt or "").split()
        if i % 5 == 0:
            out.append(" ".join(_WORDS * 3))
        else:
            mixed = [
                w if j % 3 else _WORDS[(i + j) % len(_WORDS)]
                for j, w in enumerate(toks)
            ]
            out.append(" ".join(mixed))
    t = t.set_column(t.column_names.index("text"), "text", pa.array(out))
    if "n_chars" in t.column_names:
        t = t.set_column(
            t.column_names.index("n_chars"),
            "n_chars",
            pa.array(
                np.array([len(x) for x in out], np.int64),
                t.schema.field("n_chars").type,
            ),
        )
    return t


if __name__ == "__main__":
    dst = build_corpus("/tmp/sf_unicode", _rewrite)
    raise SystemExit(run_gate(dst, sys.argv[1:]))
