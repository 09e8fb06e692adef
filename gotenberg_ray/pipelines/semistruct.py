"""Eighth analytic wave (round 4) — semi-structured extraction and
grouped order statistics, each with an exact DuckDB twin:

- ``props_value_stats``: extract the numeric ``k`` field from the
  ``events.props`` JSON string column with ONE vectorized RE2 kernel
  (``pc.extract_regex``) — no per-row ``json.loads`` — then fold
  count/sum/min/max per event type. Rows whose props don't carry a
  numeric ``k`` are excluded, exactly like the twin's
  ``json_extract IS NOT NULL`` gate. The reference parses request
  metadata JSON per form field (pkg/modules/api/context.go); here the
  extraction is a batch kernel, not a row loop.

- ``priority_price_percentiles``: per-priority EXACT discrete
  percentiles (p25/p50/p75/p90) of the order price in cents, via the
  distributed VALUE-HISTOGRAM plan: per-batch (priority, cents)
  count fold -> one priority-keyed exchange carrying only DISTINCT
  (value, count) pairs -> per-bucket sort + cumulative-count
  searchsorted at ``ceil(q*n)`` (DuckDB's ``quantile_disc`` position,
  verified empirically). Duplicate prices collapse before the
  exchange, so shuffle volume is bounded by value cardinality, not
  row count; for unbounded-cardinality values the two-pass
  median2p plan (analytics2) is the fallback.

- ``priority_revenue_share``: ratio-to-report window — each
  (priority, year) cell's share of its YEAR's total revenue in basis
  points, integer-exact (``cents * 10000 // year_total``). One fold
  to the category-bounded grid; the window is a driver pass over that
  tiny grid, like the twin's ``sum() OVER (PARTITION BY year)``.

Scale contract: pruned reads, per-batch partial folds before every
exchange, integer money math, driver-side work bounded by category
cardinality (|priorities| x |years|) or value cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max, Min, Sum

from ..functions.frames import ensure_columns
from .relational import _read

# (label, numerator, denominator) — exact rational quantiles so the
# ceil(q*n) position never suffers float rounding
PCTS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ------------------------------------------------- JSON field extract


def props_value_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type stats of the numeric ``k`` prop, extracted with
    one vectorized regex kernel per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["props"], r'"k"\s*:\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k": k,
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        ).filter(pc.is_valid(k))
        return t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )

    df = (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("one_sum", alias_name="n"),
            Sum("k_sum", alias_name="sum_k"),
            Min("k_min", alias_name="min_k"),
            Max("k_max", alias_name="max_k"),
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"event_type": "object", "n": "int64", "sum_k": "int64",
         "min_k": "int64", "max_k": "int64"},
    )
    for c in ("n", "sum_k", "min_k", "max_k"):
        df[c] = df[c].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


PROPS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(k)::BIGINT AS sum_k,
       min(k)::BIGINT AS min_k,
       max(k)::BIGINT AS max_k
FROM e WHERE k IS NOT NULL GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------- grouped exact percentiles (disc)


def priority_price_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-priority discrete percentiles of order price (cents)
    via the value-histogram plan: only distinct (priority, cents,
    count) triples shuffle; each bucket answers all four quantiles
    with one sort + one searchsorted."""

    def local(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "cents": _cents(batch["o_totalprice"]),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["o_orderpriority", "cents"]).aggregate([("n", "sum")])

    def per_group(part: pa.Table) -> pa.Table:
        # one group = one priority (|priorities| is tiny; each group's
        # payload is its distinct VALUE histogram, not its rows)
        prio = part["o_orderpriority"][0].as_py()
        cents = part["cents"].to_numpy(zero_copy_only=False)
        n = part["n_sum"].to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        v, cnt = cents[order], n[order]
        # merge duplicate values from different partial blocks
        heads = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        v = v[heads]
        cnt = np.add.reduceat(cnt, heads)
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        row = {"o_orderpriority": [prio], "n_orders": [total]}
        for label, num, den in PCTS:
            pos = -((-total * num) // den)  # ceil(total * q), exact
            idx = int(np.searchsorted(cum, pos, side="left"))
            row[label + "_e2"] = [int(v[idx])]
        return pa.table(
            {k: pa.array(vals, pa.int64() if k != "o_orderpriority" else None)
             for k, vals in row.items()}
        )

    df = (
        _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
        .map_batches(local, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(per_group, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"o_orderpriority": "object", "n_orders": "int64",
         **{label + "_e2": "int64" for label, _, _ in PCTS}},
    )
    for c in df.columns:
        if c != "o_orderpriority":
            df[c] = df[c].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


PCT_SQL = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_orders,
       quantile_disc(cents, 0.25)::BIGINT AS p25_e2,
       quantile_disc(cents, 0.50)::BIGINT AS p50_e2,
       quantile_disc(cents, 0.75)::BIGINT AS p75_e2,
       quantile_disc(cents, 0.90)::BIGINT AS p90_e2
FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------------------ ratio-to-report window


def priority_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Each (priority, year) cell's share of its year's total revenue
    in basis points, integer-exact. Fold once to the category-bounded
    grid; the ratio window is a driver pass over that grid."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "order_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                "cents": _cents(batch["o_totalprice"]),
            }
        )
        return t.group_by(["o_orderpriority", "order_year"]).aggregate(
            [("cents", "sum")]
        )

    df = (
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "order_year"])
        .aggregate(Sum("cents_sum", alias_name="revenue_e2"))
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"o_orderpriority": "object", "order_year": "int64",
         "revenue_e2": "int64"},
    )
    year_total = df.groupby("order_year")["revenue_e2"].transform("sum")
    df["year_revenue_e2"] = year_total.astype("int64")
    df["share_bp"] = (
        df["revenue_e2"].astype("int64") * 10_000 // year_total.astype("int64")
    ).astype("int64")
    df["revenue_e2"] = df["revenue_e2"].astype("int64")
    df["order_year"] = df["order_year"].astype("int64")
    return (
        df[["o_orderpriority", "order_year", "revenue_e2",
            "year_revenue_e2", "share_bp"]]
        .sort_values(["o_orderpriority", "order_year"])
        .reset_index(drop=True)
    )


SHARE_SQL = """
WITH y AS (
  SELECT o_orderpriority,
         EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_e2
  FROM orders GROUP BY 1, 2),
w AS (
  SELECT o_orderpriority, order_year, revenue_e2,
         sum(revenue_e2) OVER (PARTITION BY order_year)::BIGINT
           AS year_revenue_e2
  FROM y)
SELECT o_orderpriority, order_year, revenue_e2, year_revenue_e2,
       (revenue_e2 * 10000 // year_revenue_e2)::BIGINT AS share_bp
FROM w ORDER BY o_orderpriority, order_year
"""
