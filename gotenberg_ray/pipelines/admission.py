"""Sub-resource admission pipeline: the pause-filter decision algebra
(stages/subresource.py) run distributed over a span corpus derived from
the documents table.

Each document gets one media span whose ref is a deterministic function
of ``doc_id % 5`` — the five templates cover every decision branch
(public https allow, metadata-IP deny, own-workdir file allow, non-/tmp
file deny, deny-list match). The aggregate (reason → count) is exactly
re-derivable in SQL, so this operator is oracle-checked end-to-end.

Scale notes: the spanify map and the admission stage are per-batch
Arrow transforms (no shuffle); only the tiny (reason, n) partials
reach the final groupby. The admission stage is a callable CLASS so
regex compilation and the per-ref memo live once per actor.
"""

from __future__ import annotations

import pyarrow as pa

from ..io import read_table
from ..schemas import DOCUMENTS_SCHEMA
from ..stages.subresource import SubResourceAdmission

# the Chromium default deny posture (outbound_test.go:132-134) plus a
# tracker deny — templates 3 and 4 hit these
_POLICY = dict(
    deny=(r"^file:(?!//\/tmp/).*", r"^https://tracker\."),
    deny_private_ips=True,
    workdir="/tmp/gotenberg",
)


def _spanify(batch: pa.Table) -> pa.Table:
    """documents row → one-media-span page row; ref by doc_id % 5."""
    ids = batch.column("doc_id").to_pylist()
    spans, routes = [], []
    for i in ids:
        d = f"doc-{i:06d}"
        k = i % 5
        ref = (
            f"https://assets.example.com/{d}/img.png",
            f"http://169.254.169.254/meta/{d}",
            f"file:///tmp/gotenberg/{d}/logo.png",
            f"file:///etc/{d}.conf",
            f"https://tracker.bad.example/{d}",
        )[k]
        spans.append(
            [
                {"kind": "text", "text": "p", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": ref, "offset": 1},
            ]
        )
        routes.append("convert/html")  # local-file route: own workdir allowed
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:06d}" for i in ids], pa.string()),
            "route": pa.array(routes, pa.string()),
            "options_json": pa.array(["{}"] * len(ids), pa.string()),
            "spans": pa.array(spans, DOCUMENTS_SCHEMA.field("spans").type),
        }
    )


def subresource_admission(sf_dir: str):
    """Per-sub-resource allow/deny counts by reason (pause filter,
    events.go:46-189) — distributed decide, tiny aggregate."""
    ds = (
        read_table(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_spanify, batch_format="pyarrow")
        .map_batches(
            SubResourceAdmission,
            fn_constructor_kwargs=_POLICY,
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=2,
        )
        .groupby("reason")
        .count()
    )
    df = ds.to_pandas().rename(columns={"count()": "n"})
    from ..functions.frames import ensure_columns

    df = ensure_columns(df, {"reason": "object", "n": "int64"})
    return df.sort_values("reason").reset_index(drop=True)


# the SQL twin re-derives each template's expected decision from
# doc_id % 5: 0 → allow, 1 → metadata IP (non-public), 2 → own-workdir
# file:// allow, 3 → non-/tmp file deny-list, 4 → tracker deny-list
ADMISSION_SQL = """
SELECT
  CASE doc_id % 5
    WHEN 0 THEN ''
    WHEN 1 THEN 'filtered:non_public_ip'
    WHEN 2 THEN ''
    WHEN 3 THEN 'filtered:deny_list'
    ELSE 'filtered:deny_list'
  END AS reason,
  COUNT(*) AS n
FROM documents
GROUP BY 1
ORDER BY reason
"""
