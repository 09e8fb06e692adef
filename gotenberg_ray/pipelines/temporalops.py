"""Ninth analytic wave (round 4) — temporal-weighted aggregation and
stream cleaning, each with an exact DuckDB twin:

- ``user_value_twap``: time-weighted average of ``events.value`` per
  user — each reading is weighted by how long it was "current" (the
  LEAD gap to the next event; the last reading carries no weight,
  exactly like the twin's ``LEAD(ts) - ts``). Needs every (user, ts)
  pair co-located: ONE user-keyed exchange, then per-bucket lexsort +
  segmented diff; weights are exact epoch microseconds and the TWAP
  is integer floor division, so the hash is layout-independent.
  Overflow bound: sum(v_e2 * dur_us) per user <= max_v_e2 * span_us
  (~1.5e17 for this corpus' 30-day span) << int64.

- ``priority_running_revenue``: cumulative revenue per priority in
  order-year order (a running-total window). One fold to the
  category-bounded (priority, year) grid; the cumsum runs on that
  grid, mirroring ``SUM() OVER (PARTITION BY priority ORDER BY
  year)`` which DuckDB evaluates with the default RANGE frame — one
  row per existing (priority, year), no densification.

- ``events_dedup_burst``: burst deduplication — drop an event when
  the SAME (user, type) fired within the last 300 s (gap-based LAG
  filter, the standard at-least-once-delivery cleaner). Per-bucket
  lexsort over (user, type, ts, event_id) + one vectorized gap test;
  survivors keep their full identity. Tie order (ts, then event_id)
  matches the twin's window ORDER BY exactly, so duplicates at the
  same microsecond resolve identically.

Scale contract: pruned reads, the only all-to-all moves are the two
keyed exchanges (user / user-type buckets via hash partition ids);
per-bucket kernels are single lexsort + segmented numpy passes, no
per-group Python. Reference semantics: the reference's webhook
de-bounce and per-route latency accounting (pkg/modules/api/) are the
WHAT; the bucketed segmented kernels are the Ray-native HOW.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.frames import ensure_columns
from .relational import JOIN_PARTITIONS, _read

BURST_WINDOW_US = 300 * 1_000_000  # 5 minutes


def _v_e2(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# --------------------------------------------------------------- TWAP


def user_value_twap(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average of ``value`` (x100, floor), the
    LEAD-gap weighting; users with a single event or a zero time span
    are excluded (no duration to weight)."""

    def local(batch: pa.Table) -> pa.Table:
        from .joins import partition_ids

        t = pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
                "v_e2": _v_e2(batch["value"]),
            }
        )
        return t.append_column(
            "pid", partition_ids(t.column("user_id"), JOIN_PARTITIONS)
        )

    def per_bucket(part: pa.Table) -> pa.Table:
        u = part["user_id"].to_numpy(zero_copy_only=False)
        ts = part["ts_us"].to_numpy(zero_copy_only=False)
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        v = part["v_e2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, v_s = u[order], ts[order], v[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        counts = np.diff(np.r_[starts, len(u_s)])
        ok = counts >= 2
        if not ok.any():
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "span_us": pa.array([], pa.int64()),
                    "twap_e2": pa.array([], pa.int64()),
                }
            )
        ends = np.r_[starts[1:], len(u_s)] - 1
        # zero-span users (every event at one microsecond) have no
        # weightable duration — excluded, like the twin's span gate
        ok &= ts_s[ends] > ts_s[starts]
        if not ok.any():
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "span_us": pa.array([], pa.int64()),
                    "twap_e2": pa.array([], pa.int64()),
                }
            )
        # per-row duration = gap to the next row; the gap AT a segment
        # end is a seam to the next user — zero both it and its weight
        dur = np.r_[np.diff(ts_s), np.int64(0)]
        dur[ends] = 0
        wsum = np.add.reduceat(v_s * dur, starts)[ok]
        dsum = np.add.reduceat(dur, starts)[ok]
        return pa.table(
            {
                "user_id": pa.array(u_s[starts[ok]]),
                "n_events": pa.array(counts[ok].astype(np.int64)),
                "span_us": pa.array(
                    (ts_s[ends[ok]] - ts_s[starts[ok]]).astype(np.int64)
                ),
                "twap_e2": pa.array((wsum // dsum).astype(np.int64)),
            }
        )

    df = (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(local, batch_format="pyarrow")
        .groupby("pid", num_partitions=JOIN_PARTITIONS)
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["pid"])), batch_format="pyarrow"
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"user_id": "int64", "n_events": "int64", "span_us": "int64",
         "twap_e2": "int64"},
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


TWAP_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_e2,
         lead(epoch_us(ts)::BIGINT) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
  FROM events),
w AS (
  SELECT user_id,
         count(*)::BIGINT AS n_events,
         (max(ts_us) - min(ts_us))::BIGINT AS span_us,
         sum(v_e2 * (next_us - ts_us))::BIGINT AS wsum,
         sum(next_us - ts_us)::BIGINT AS dsum
  FROM e GROUP BY user_id
  HAVING count(*) >= 2 AND max(ts_us) > min(ts_us))
SELECT user_id, n_events, span_us,
       CAST(wsum // dsum AS BIGINT) AS twap_e2
FROM w ORDER BY user_id
"""


# ------------------------------------------------ running total window


def priority_running_revenue(sf_dir: str) -> pd.DataFrame:
    """Cumulative revenue per priority across its order years —
    ``SUM() OVER (PARTITION BY priority ORDER BY year)`` on the
    category-bounded grid produced by one distributed fold."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "order_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                "cents": _v_e2(batch["o_totalprice"]),
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
    df = df.sort_values(["o_orderpriority", "order_year"]).reset_index(drop=True)
    df["running_revenue_e2"] = (
        df.groupby("o_orderpriority")["revenue_e2"].cumsum().astype("int64")
    )
    df["revenue_e2"] = df["revenue_e2"].astype("int64")
    df["order_year"] = df["order_year"].astype("int64")
    return df


RUNNING_SQL = """
WITH y AS (
  SELECT o_orderpriority,
         EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_e2
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, order_year, revenue_e2,
       sum(revenue_e2) OVER (PARTITION BY o_orderpriority
                             ORDER BY order_year)::BIGINT
         AS running_revenue_e2
FROM y ORDER BY o_orderpriority, order_year
"""


# ------------------------------------------------------ burst dedup


def events_dedup_burst(sf_dir: str) -> pd.DataFrame:
    """Keep an event only if the same (user, type) did NOT fire within
    the preceding 300 s (LAG-gap filter). Survivors keep their full
    identity; tie order within a microsecond is event_id ASC."""

    def local(batch: pa.Table) -> pa.Table:
        from .joins import partition_ids

        t = pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
            }
        )
        return t.append_column(
            "pid", partition_ids(t.column("user_id"), JOIN_PARTITIONS)
        )

    def per_bucket(part: pa.Table) -> pa.Table:
        u = part["user_id"].to_numpy(zero_copy_only=False)
        ty = part["event_type"].to_numpy(zero_copy_only=False)
        ts = part["ts_us"].to_numpy(zero_copy_only=False)
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        # dictionary-encode the type strings once for the lexsort
        tcode = pd.factorize(ty, sort=True)[0]
        order = np.lexsort((eid, ts, tcode, u))
        u_s, t_s, ts_s, e_s = u[order], tcode[order], ts[order], eid[order]
        new_key = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] != t_s[:-1])]
        gap = np.r_[np.int64(0), np.diff(ts_s)]
        keep = new_key | (gap > BURST_WINDOW_US)
        return pa.table(
            {
                "event_id": pa.array(e_s[keep]),
                "user_id": pa.array(u_s[keep]),
                "event_type": pa.array(ty[order][keep]),
            }
        )

    df = (
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        .map_batches(local, batch_format="pyarrow")
        .groupby("pid", num_partitions=JOIN_PARTITIONS)
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["pid"])), batch_format="pyarrow"
        )
        .to_pandas()
    )
    df = ensure_columns(
        df, {"event_id": "int64", "user_id": "int64", "event_type": "object"}
    )
    for c in ("event_id", "user_id"):
        df[c] = df[c].astype("int64")
    return df.sort_values("event_id").reset_index(drop=True)


BURST_SQL = """
WITH g AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts)::BIGINT
           - lag(epoch_us(ts)::BIGINT) OVER
               (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_id, user_id, event_type
FROM g WHERE gap_us IS NULL OR gap_us > 300000000
ORDER BY event_id
"""
