"""URL canonicalization under the oracle gate — ties the crawl's
RFC-3986 canonicalizer (`functions/urlkit.py`, the frontier seen-key
function; reference behavior: gotenberg's URL validation in
pkg/modules/api) into the value-checked query suite.

A deterministic messy-URL corpus derives from doc_ids so the DuckDB
twin can compute the EXPECTED canonical set arithmetically, without
reimplementing canonicalization: every raw variant (mixed-case host,
upper-case scheme, explicit default port, dot segments, trailing-dot
host, fragment) canonicalizes to ``https://host<k>.example.com/p/<id>``
— and docs ≡2 (mod 4) emit BOTH a messy and a clean twin of the same
canonical, so any canonicalization failure shows up as a per-host
distinct-count mismatch, not just a cosmetic string diff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from ..functions.frames import ensure_columns
from ..functions.urlkit import canonicalize_url_host
from ..io import read_table

N_HOSTS = 10


def _raw_urls(doc_id: int) -> list[str]:
    h = doc_id % N_HOSTS
    v = doc_id % 4
    if v == 0:
        return [f"https://Host{h}.Example.COM/p/{doc_id}"]
    if v == 1:
        return [f"HTTPS://host{h}.example.com:443/p/{doc_id}"]
    if v == 2:  # messy + clean twin of the SAME canonical
        return [
            f"https://host{h}.example.com/a/../p/{doc_id}",
            f"https://host{h}.example.com/p/{doc_id}",
        ]
    return [f"https://host{h}.example.com./p/{doc_id}#frag"]


def url_host_counts(sf_dir: str) -> pd.DataFrame:
    """Per-host raw-URL and distinct-canonical counts over the derived
    messy corpus — the crawl's dedup-key function exercised end to end.

    Distributed shape: per-batch URL generation + canonicalization
    (the same per-string kernel the frontier admission path runs),
    batch-local (host, canonical) dedup, then ONE keyed exchange:
    groupby(host, canonical) collapses cross-batch duplicates and a
    host-sized groupby folds the counts."""

    def canon(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hosts, canons, raws = [], [], []
        for d in ids.tolist():
            for raw in _raw_urls(int(d)):
                c, h = canonicalize_url_host(raw)
                hosts.append(h)
                canons.append(c)
                raws.append(1)
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "canon": pa.array(canons, pa.string()),
                "n_urls": pa.array(raws, pa.int64()),
            }
        )
        return (
            t.group_by(["host", "canon"])
            .aggregate([("n_urls", "sum")])
            .rename_columns(["host", "canon", "n_urls"])
        )

    df = (
        read_table(sf_dir, "documents", ["doc_id"])
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["host", "canon"])
        .aggregate(Sum("n_urls", alias_name="n_urls"))
        .groupby("host")
        .aggregate(
            Sum("n_urls", alias_name="n_urls"),
            Count(alias_name="n_canon"),
        )
        .to_pandas()
    )
    df = ensure_columns(
        df, {"host": "object", "n_urls": "int64", "n_canon": "int64"}
    )
    for c in ("n_urls", "n_canon"):
        df[c] = df[c].astype("int64")
    return df.sort_values("host").reset_index(drop=True)


URL_HOSTS_SQL = f"""
WITH u AS (
  SELECT doc_id,
         'host' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example.com'
           AS host,
         CASE WHEN doc_id % 4 = 2 THEN 2 ELSE 1 END AS n_raw
  FROM documents)
SELECT host,
       sum(n_raw)::BIGINT AS n_urls,
       count(*)::BIGINT AS n_canon
FROM u GROUP BY host ORDER BY host
"""
