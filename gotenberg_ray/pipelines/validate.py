"""Distributed data-validation (expectation-suite) operator.

The Great-Expectations/dbt-test pattern (public): declare per-table
expectations — value ranges, uniqueness, membership in a reference
set — and compute exact violation counts in one streaming pass each.
At 100 TB each check is either a per-batch predicate folded by a
streaming Sum (range checks), a two-phase distinct (uniqueness), or a
bucketed ANTI join against the reference side (membership) — nothing
row-sized ever reaches the driver; the result is #checks rows.

Demo suite over ``orders``:
- ``custkey_in_reference`` — every order's customer must belong to
  the approved reference slice (AUTOMOBILE segment): membership via
  the bucketed ``hash_join(join_type='left anti')``; violations are
  the anti-join survivors, counted without materializing them.
- ``orderdate_in_window`` — orders outside [1993-01-01, 1996-12-31].
- ``one_order_per_customer`` — uniqueness expectation: rows minus
  distinct keys (two-phase exact distinct).
- ``totalprice_positive`` — a PASSING check (0 violations), so the
  suite demonstrates both outcomes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from ..functions.frames import ensure_columns

REF_SEGMENT = "AUTOMOBILE"
WINDOW_LO = "1993-01-01"
WINDOW_HI = "1996-12-31"


def _read(sf_dir: str, table: str, columns=None):
    from ..io import read_table

    return read_table(sf_dir, table, columns)


def orders_expectations(sf_dir: str) -> pd.DataFrame:
    from .joins import hash_join

    lo = pa.scalar(np.datetime64(WINDOW_LO, "us"), type=pa.timestamp("us"))
    hi = pa.scalar(
        np.datetime64(WINDOW_HI + "T23:59:59.999999", "us"),
        type=pa.timestamp("us"),
    )

    # --- range + positivity checks: one shared pruned pass ----------
    def range_partials(batch: pa.Table) -> pa.Table:
        out_window = pc.sum(
            pc.cast(
                pc.or_(
                    pc.less(batch["o_orderdate"], lo),
                    pc.greater(batch["o_orderdate"], hi),
                ),
                pa.int64(),
            )
        ).as_py() or 0
        nonpos = pc.sum(
            pc.cast(pc.less_equal(batch["o_totalprice"], 0.0), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "out_window": pa.array([out_window], pa.int64()),
                "nonpos": pa.array([nonpos], pa.int64()),
                "rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    row = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(range_partials, batch_format="pyarrow")
        .aggregate(Sum("out_window"), Sum("nonpos"), Sum("rows"))
    )
    out_window = int(row["sum(out_window)"] or 0) if row else 0
    nonpos = int(row["sum(nonpos)"] or 0) if row else 0
    n_rows = int(row["sum(rows)"] or 0) if row else 0

    # --- uniqueness: two-phase exact distinct ------------------------
    def local_keys(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": batch["o_custkey"]}
        ).group_by("o_custkey").aggregate([])

    n_distinct = (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(local_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_c"))
        .count()  # Dataset.count() IS the row count — no extra stage
    )
    dup_violations = n_rows - n_distinct

    # --- membership: bucketed ANTI join vs the reference slice ------
    def ref_side(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_mktsegment"], REF_SEGMENT)
        return pa.table({"c_custkey": batch.filter(keep)["c_custkey"]})

    orphans = hash_join(
        _read(sf_dir, "orders", ["o_custkey"]),
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            ref_side, batch_format="pyarrow"
        ),
        on="o_custkey",
        right_on="c_custkey",
        join_type="left anti",
        left_schema=[("o_custkey", pa.int64())],
        right_schema=[("c_custkey", pa.int64())],
    )
    fk_violations = orphans.count()

    return pd.DataFrame(
        {
            "check_name": [
                "custkey_in_reference",
                "one_order_per_customer",
                "orderdate_in_window",
                "totalprice_positive",
            ],
            "violations": [fk_violations, dup_violations, out_window, nonpos],
        }
    ).astype({"check_name": "object", "violations": "int64"}).sort_values(
        "check_name"
    ).reset_index(drop=True)


EXPECTATIONS_SQL = f"""
SELECT * FROM (
  SELECT 'custkey_in_reference' AS check_name,
         (SELECT count(*) FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey
              AND c.c_mktsegment = '{REF_SEGMENT}'))::BIGINT AS violations
  UNION ALL
  SELECT 'one_order_per_customer',
         (SELECT count(*) - count(DISTINCT o_custkey) FROM orders)::BIGINT
  UNION ALL
  SELECT 'orderdate_in_window',
         (SELECT count(*) FROM orders
          WHERE o_orderdate < TIMESTAMP '{WINDOW_LO} 00:00:00'
             OR o_orderdate > TIMESTAMP '{WINDOW_HI} 23:59:59.999999')::BIGINT
  UNION ALL
  SELECT 'totalprice_positive',
         (SELECT count(*) FROM orders WHERE o_totalprice <= 0)::BIGINT
) ORDER BY check_name
"""


# ----------------------------------------------------- column profiling

# orders schema in profile order; each entry: (name, kind) where kind
# picks the canonical 64-bit encoding for exact distinct counting
PROFILE_COLS = (
    ("o_custkey", "int"),
    ("o_orderdate", "ts"),
    ("o_orderkey", "int"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "f64"),
)
_PROFILE_P = 32


def _col64(col: pa.ChunkedArray, kind: str) -> np.ndarray:
    """Canonical int64 encoding whose distinct count equals the
    column's distinct VALUE count: identity for ints/timestamps, IEEE
    bit pattern for doubles (exact — the corpus has no NaN/-0.0
    aliasing), FNV-1a for strings (collision odds ~n^2/2^64)."""
    if kind == "str":
        from ..functions.hashing import fnv64

        return fnv64(col).view(np.int64)
    if kind == "f64":
        return col.to_numpy(zero_copy_only=False).view(np.int64)
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def orders_profile(sf_dir: str) -> pd.DataFrame:
    """One-pass-per-fold column profile of ``orders``: exact row,
    null, and DISTINCT counts for every column (the df.describe() /
    data-catalog profiling operator).

    Counts fold to a |columns|-row grid per batch. Exact distincts use
    the canonical-64 encoding: each batch emits its LOCAL distinct
    (col_id, v64) pairs, ONE hash-keyed exchange dedups globally, and
    each bucket reports per-column partial distinct counts — only
    distinct pairs shuffle, nothing row-sized reaches the driver."""
    from .joins import partition_ids

    names = [c for c, _ in PROFILE_COLS]

    def count_partials(batch: pa.Table) -> pa.Table:
        rows, nulls, ids = [], [], []
        for i, (name, _) in enumerate(PROFILE_COLS):
            ids.append(i)
            rows.append(batch.num_rows)
            nulls.append(batch.column(name).null_count)
        return pa.table(
            {
                "col_id": pa.array(ids, pa.int64()),
                "rows": pa.array(rows, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
            }
        )

    counts = (
        _read(sf_dir, "orders", names)
        .map_batches(count_partials, batch_format="pyarrow")
        .groupby("col_id")
        .aggregate(Sum("rows", alias_name="n_rows"), Sum("nulls", alias_name="n_null"))
        .to_pandas()
    )
    counts = ensure_columns(
        counts, {"col_id": "int64", "n_rows": "int64", "n_null": "int64"}
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        cids, vs = [], []
        for i, (name, kind) in enumerate(PROFILE_COLS):
            col = batch.column(name)
            v = _col64(col.drop_null() if col.null_count else col, kind)
            v = np.unique(v)  # batch-local dedup before the exchange
            cids.append(np.full(len(v), i, dtype=np.int64))
            vs.append(v)
        t = pa.table(
            {
                "col_id": pa.array(np.concatenate(cids) if cids else [], pa.int64()),
                "v": pa.array(np.concatenate(vs) if vs else [], pa.int64()),
            }
        )
        return t.append_column("pid", partition_ids(t.column("v"), _PROFILE_P))

    def per_bucket(part: pa.Table) -> pa.Table:
        cid = part["col_id"].to_numpy(zero_copy_only=False)
        v = part["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, cid))
        c_s, v_s = cid[order], v[order]
        fresh = np.r_[True, (c_s[1:] != c_s[:-1]) | (v_s[1:] != v_s[:-1])]
        per_col = np.bincount(c_s[fresh], minlength=len(PROFILE_COLS))
        return pa.table(
            {
                "col_id": pa.array(
                    np.arange(len(PROFILE_COLS), dtype=np.int64)
                ),
                "nd": pa.array(per_col.astype(np.int64)),
            }
        )

    distinct = (
        _read(sf_dir, "orders", names)
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("pid", num_partitions=_PROFILE_P)
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["pid"])), batch_format="pyarrow"
        )
        .to_pandas()
    )
    distinct = ensure_columns(distinct, {"col_id": "int64", "nd": "int64"})
    nd = distinct.groupby("col_id")["nd"].sum() if len(distinct) else pd.Series(dtype="int64")

    out = pd.DataFrame({"col_name": names, "col_id": range(len(names))})
    c = counts.set_index("col_id")
    out["n_rows"] = out["col_id"].map(c["n_rows"]).fillna(0).astype("int64")
    out["n_null"] = out["col_id"].map(c["n_null"]).fillna(0).astype("int64")
    out["n_distinct"] = out["col_id"].map(nd).fillna(0).astype("int64")
    return (
        out[["col_name", "n_rows", "n_null", "n_distinct"]]
        .sort_values("col_name")
        .reset_index(drop=True)
    )


PROFILE_SQL = """
SELECT * FROM (
  SELECT 'o_custkey' AS col_name, count(*)::BIGINT AS n_rows,
         (count(*) - count(o_custkey))::BIGINT AS n_null,
         count(DISTINCT o_custkey)::BIGINT AS n_distinct FROM orders
  UNION ALL
  SELECT 'o_orderdate', count(*)::BIGINT,
         (count(*) - count(o_orderdate))::BIGINT,
         count(DISTINCT o_orderdate)::BIGINT FROM orders
  UNION ALL
  SELECT 'o_orderkey', count(*)::BIGINT,
         (count(*) - count(o_orderkey))::BIGINT,
         count(DISTINCT o_orderkey)::BIGINT FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*)::BIGINT,
         (count(*) - count(o_orderpriority))::BIGINT,
         count(DISTINCT o_orderpriority)::BIGINT FROM orders
  UNION ALL
  SELECT 'o_orderstatus', count(*)::BIGINT,
         (count(*) - count(o_orderstatus))::BIGINT,
         count(DISTINCT o_orderstatus)::BIGINT FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*)::BIGINT,
         (count(*) - count(o_totalprice))::BIGINT,
         count(DISTINCT o_totalprice)::BIGINT FROM orders
) ORDER BY col_name
"""
