"""Tenth analytic wave: contract tests beyond the DuckDB twins — the
bounded-k ordered concat (order, truncation, counts), the exact OLS
moments vs a Fraction reference including the trunc-vs-floor division
edge, rolling-median head frames and even/odd mid selection, the
unpivot grid, and the session-concurrency rank identity vs a
quadratic interval-overlap reference."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import holistic as HO
from gotenberg_ray.pipelines import temporalops as TO


def _write_customer(tmp_path, rows):
    """rows: list of (nationkey, mktsegment, name)."""
    t = pa.table(
        {
            "c_custkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "c_name": pa.array([r[2] for r in rows]),
            "c_nationkey": pa.array([r[0] for r in rows], pa.int32()),
            "c_acctbal": pa.array([0.0] * len(rows)),
            "c_mktsegment": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "customer.parquet")
    return str(tmp_path)


def _write_part(tmp_path, rows):
    """rows: list of (p_type, p_size, p_retailprice)."""
    t = pa.table(
        {
            "p_partkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "p_name": pa.array(["p"] * len(rows)),
            "p_brand": pa.array(["b"] * len(rows)),
            "p_type": pa.array([r[0] for r in rows]),
            "p_size": pa.array([r[1] for r in rows], pa.int32()),
            "p_retailprice": pa.array([float(r[2]) for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "part.parquet")
    return str(tmp_path)


def _write_orders(tmp_path, rows):
    """rows: list of (day_num, totalprice)."""
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1970-01-01") + pd.Timedelta(days=r[0]) for r in rows],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([float(r[1]) for r in rows]),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, ts_us)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


# ------------------------------------------------- ordered string_agg


def test_first_names_order_truncation_counts(ray_session, tmp_path):
    rows = [
        (1, "AUTO", "zeta"), (1, "AUTO", "alpha"), (1, "AUTO", "mid"),
        (1, "AUTO", "beta"),                      # 4 members → keep 3
        (1, "BIKE", "only"),                      # 1 member → keep 1
        (2, "AUTO", "bb"), (2, "AUTO", "aa"),     # 2 members
    ]
    df = HO.segment_first_names(_write_customer(tmp_path, rows))
    got = {
        (int(r.nationkey), r.mktsegment): (r.first_names, int(r.n_customers))
        for r in df.itertuples(index=False)
    }
    assert got == {
        (1, "AUTO"): ("alpha,beta,mid", 4),
        (1, "BIKE"): ("only", 1),
        (2, "AUTO"): ("aa,bb", 2),
    }


# --------------------------------------------------- grouped exact OLS


def _slope_reference(pts):
    """Exact OLS via Fractions + DuckDB-style TRUNCATING division."""
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    den = n * sxx - sx * sx
    if den == 0:
        return None
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q
    return (
        tdiv(10_000 * (n * sxy - sx * sy), den),
        tdiv(10_000 * (sy * sxx - sx * sxy), den),
    )


def test_slope_exact_line_and_negative(ray_session, tmp_path):
    # type A: cents = 300·size + 700 exactly → slope 300 cents/size
    # = 3,000,000 bp; intercept 700 cents = 7,000,000 bp
    a = [("A", s, (300 * s + 700) / 100.0) for s in range(1, 6)]
    # type B: cents = 1000 − 200·size → slope −2,000,000 bp
    b = [("B", s, (1000 - 200 * s) / 100.0) for s in range(1, 5)]
    # type C: zero size variance → dropped
    c = [("C", 7, 1.0), ("C", 7, 9.0)]
    df = HO.part_price_slope(_write_part(tmp_path, a + b + c))
    got = {r.p_type: (int(r.slope_bp), int(r.intercept_bp)) for r in df.itertuples(index=False)}
    assert got == {"A": (3_000_000, 7_000_000), "B": (-2_000_000, 10_000_000)}


def test_slope_truncates_toward_zero_not_floor(ray_session, tmp_path):
    # x = 0,1,2,3 ; y cents = 1,0,0,0 → num = −6, den = 20 →
    # 10000·(−6)/20 = −3000 (exact); perturb to force a fractional
    # negative: y cents = 1,0,0,1 → num = 4·4 − 6·2 = 4 → +2000;
    # y cents = 2,0,1,0 → sy=3, sxy=2, num = 8−18 = −10 → −5000;
    # y cents = 1,1,0,0 → sy=2, sxy=1, num=4−12=−8 → −4000;
    # y cents = 3,1,1,1 → sy=6, sxy=6, num=24−36=−12 → −6000;
    # use den=20 with num=−1: y = (5,4,4,4)/4? prices are cents-exact,
    # so scale: y cents = 13,10,10,10 → sy=43, sxy=60,
    # num = 4·60 − 6·43 = −18 → 10000·(−18)//20: floor −9000 exact.
    # Force non-divisible: y cents = 13,10,10,11 → sy=44, sxy=63,
    # num = 252−264 = −12 → −6000 exact. den 20 divides 1e4·anything
    # even... use 5 points (den = 5·30 − 100 = 50): y cents =
    # 1,0,0,0,0 → sy=1, sxy=0, num = −10 → −2000. den 50 also divides.
    # x = 0,1,3 → den = 3·10 − 16 = 14: y cents = 1,0,0 → sy=1,
    # sxy=0, num = 0·3 − 4·1 = −4 → 10000·(−4) = −40000; −40000/14 =
    # −2857.14… → trunc −2857, floor −2858.
    rows = [("T", 0, 0.01), ("T", 1, 0.00), ("T", 3, 0.00)]
    df = HO.part_price_slope(_write_part(tmp_path, rows))
    assert int(df["slope_bp"].iloc[0]) == -2857  # trunc, NOT floor (−2858)
    ref = _slope_reference([(0, 1), (1, 0), (3, 0)])
    assert int(df["slope_bp"].iloc[0]) == ref[0]
    assert int(df["intercept_bp"].iloc[0]) == ref[1]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 500)), min_size=2, max_size=30
    )
)
def test_slope_matches_fraction_reference(ray_session, tmp_path_factory, pts):
    tmp = tmp_path_factory.mktemp("slope")
    rows = [("T", x, y / 100.0) for x, y in pts]
    df = HO.part_price_slope(_write_part(tmp, rows))
    ref = _slope_reference(pts)
    if ref is None:
        assert df.empty
    else:
        assert (int(df["slope_bp"].iloc[0]), int(df["intercept_bp"].iloc[0])) == ref


# ---------------------------------------------------- rolling median


def test_rolling_median_frames(ray_session, tmp_path):
    # days 0..8 with a gap at 4..5 (dense zeros fill in)
    rows = [(0, 1.0), (1, 5.0), (2, 3.0), (3, 7.0), (6, 2.0), (7, 9.0), (8, 4.0)]
    df = HO.orders_rolling_median(_write_orders(tmp_path, rows))
    dense = {d: 0 for d in range(9)}
    for d, p in rows:
        dense[d] += round(p * 100)
    exp = []
    for i in range(9):
        w = sorted(dense[j] for j in range(max(0, i - 6), i + 1))
        n = len(w)
        exp.append(w[(n - 1) // 2] + w[n // 2])
    assert df["med2_e2"].tolist() == exp
    assert df["day"].iloc[0] == "1970-01-01"


# --------------------------------------------------------- unpivot


def test_unpivot_grid(ray_session, tmp_path):
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_partkey": pa.array([1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 1, 1], pa.int32()),
            "l_quantity": pa.array([2.0, 3.0, 5.0]),
            "l_extendedprice": pa.array([10.50, 20.25, 0.75]),
            "l_discount": pa.array([0.05, 0.10, 0.00]),
            "l_tax": pa.array([0.0, 0.0, 0.0]),
            "l_returnflag": pa.array(["A", "A", "R"]),
            "l_linestatus": pa.array(["O", "O", "O"]),
            "l_shipdate": pa.array([pd.Timestamp("1995-01-01")] * 3, pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    df = HO.lineitem_measure_unpivot(str(tmp_path))
    got = {
        (r.returnflag, r.measure): (int(r.total), int(r.n))
        for r in df.itertuples(index=False)
    }
    assert got == {
        ("A", "quantity_e2"): (500, 2),
        ("A", "extendedprice_e2"): (3075, 2),
        ("A", "discount_e4"): (1500, 2),
        ("R", "quantity_e2"): (500, 1),
        ("R", "extendedprice_e2"): (75, 1),
        ("R", "discount_e4"): (0, 1),
    }


# ---------------------------------------------- session concurrency


def _concurrency_reference(rows, gap_us=1800 * 1_000_000):
    by_user: dict[int, list[int]] = {}
    for _, uid, ts in rows:
        by_user.setdefault(uid, []).append(ts)
    sessions = []
    for uid, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for ts in tss[1:]:
            if ts - prev > gap_us:
                sessions.append((start, prev + gap_us))
                start = ts
            prev = ts
        sessions.append((start, prev + gap_us))
    hist: dict[int, int] = {}
    for i, (s, e) in enumerate(sessions):
        n = sum(
            1
            for j, (s2, e2) in enumerate(sessions)
            if j != i and s2 <= e and e2 >= s
        )
        hist[n] = hist.get(n, 0) + 1
    return hist


def test_session_concurrency_basic(ray_session, tmp_path):
    h = 3600 * 1_000_000
    rows = [
        # user 1: one session [0, 0.5h+gap] = [0, 1h]... (gap=0.5h)
        (1, 1, 0), (2, 1, h // 2),
        # user 2: session starting inside user 1's active window
        (3, 2, h // 4),
        # user 3: far away — overlaps nobody
        (4, 3, 100 * h),
        # user 1 again: second session, gap > 30 min after h/2
        (5, 1, 10 * h),
    ]
    df = TO.session_concurrency(_write_events(tmp_path, rows))
    got = dict(zip(df["n_overlap"].tolist(), df["n_sessions"].tolist()))
    assert got == {k: v for k, v in sorted(_concurrency_reference(rows).items())}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 4 * 86_400 * 1_000_000)),
        min_size=1,
        max_size=60,
    )
)
def test_session_concurrency_matches_quadratic_reference(
    ray_session, tmp_path_factory, pairs
):
    rows = [(i + 1, uid, ts) for i, (uid, ts) in enumerate(pairs)]
    tmp = tmp_path_factory.mktemp("conc")
    df = TO.session_concurrency(_write_events(tmp, rows))
    got = dict(zip(df["n_overlap"].tolist(), df["n_sessions"].tolist()))
    assert got == dict(sorted(_concurrency_reference(rows).items()))


def test_session_concurrency_cross_day_windows(ray_session, tmp_path):
    # sessions whose +30 min active window crosses midnight — the end
    # point lands in the NEXT day's bucket and the prefix offsets must
    # still pair up
    day = 86_400 * 1_000_000
    rows = [
        (1, 1, day - 60 * 1_000_000),       # active into day 1
        (2, 2, day + 10 * 1_000_000),       # starts day 1, overlaps user 1
        (3, 3, 3 * day // 2),               # midday day 1 — no overlap
    ]
    df = TO.session_concurrency(_write_events(tmp_path, rows))
    got = dict(zip(df["n_overlap"].tolist(), df["n_sessions"].tolist()))
    assert got == dict(sorted(_concurrency_reference(rows).items()))


# ------------------------------------------------ eleventh-wave trio


def _write_orders_prio(tmp_path, rows):
    """rows: list of (custkey, day_num, totalprice, priority)."""
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1970-01-01") + pd.Timedelta(days=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([float(r[2]) for r in rows]),
            "o_orderpriority": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def test_bag_ops_multiplicities(ray_session, tmp_path):
    U, H = "1-URGENT", "2-HIGH"
    rows = (
        [(1, 0, 1.0, U)] * 3 + [(1, 0, 1.0, H)] * 1   # cust 1: 3a, 1b
        + [(2, 0, 1.0, H)] * 2                          # cust 2: 0a, 2b
        + [(3, 0, 1.0, U)] * 2 + [(3, 0, 1.0, H)] * 2   # cust 3: 2a, 2b
        + [(4, 0, 1.0, "5-LOW")]                        # neither side
    )
    rows = [(c, d + i, p, pr) for i, (c, d, p, pr) in enumerate(rows)]
    df = HO.customer_bag_ops(_write_orders_prio(tmp_path, rows))
    got = dict(zip(df["op"], df["n_rows"]))
    # min/max per key: isect = 1+0+2 = 3; a−b = 2+0+0 = 2; b−a = 0+2+0
    assert got == {
        "except_all_a": 2,
        "except_all_b": 2,
        "intersect_all": 3,
        "union_all": 10,
    }


def test_histogram_single_value_and_edges(ray_session, tmp_path):
    # all prices equal → den = 1, every row lands in bin 0
    rows = [(i, 5.00) for i in range(10)]
    df = HO.orders_price_histogram(_write_orders(tmp_path, rows))
    assert df["bin"].tolist() == [0] and int(df["n_orders"].iloc[0]) == 10


def test_histogram_uniform_spread(ray_session, tmp_path):
    # prices 0.01 .. 2.00 in cents 1..200 → den = 200, bin = (e2−1)*20//200
    rows = [(i, (i + 1) / 100.0) for i in range(200)]
    df = HO.orders_price_histogram(_write_orders(tmp_path, rows))
    assert df["bin"].tolist() == list(range(20))
    assert df["n_orders"].tolist() == [10] * 20


def test_isolated_same_day_pair_kills_both(ray_session, tmp_path):
    P = "1-URGENT"
    rows = [
        (1, 10, 1.0, P), (1, 10, 1.0, P),    # same-day pair → neither isolated
        (1, 40, 1.0, P),                     # isolated (gap 30 both ways)
        (2, 0, 1.0, P), (2, 7, 1.0, P),      # 7-day gap = NOT > 7 → neither
        (3, 100, 1.0, P),                    # singleton → isolated
    ]
    df = HO.orders_isolated(_write_orders_prio(tmp_path, rows))
    assert dict(zip(df["priority"], df["n_isolated"])) == {P: 2}


def test_weighted_median_selection(ray_session, tmp_path):
    # flag A: values 1.00(w2), 2.00(w3), 5.00(w5) → W=10, target 5 →
    # cum 2,5,10 → first ≥5 is 2.00; flag R: single value
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([1] * 4, pa.int64()),
            "l_suppkey": pa.array([1] * 4, pa.int64()),
            "l_linenumber": pa.array([1] * 4, pa.int32()),
            "l_quantity": pa.array([2.0, 3.0, 5.0, 7.0]),
            "l_extendedprice": pa.array([1.00, 2.00, 5.00, 9.00]),
            "l_discount": pa.array([0.0] * 4),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["A", "A", "A", "R"]),
            "l_linestatus": pa.array(["O"] * 4),
            "l_shipdate": pa.array([pd.Timestamp("1995-01-01")] * 4, pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    df = HO.lineitem_weighted_median(str(tmp_path))
    got = {r.returnflag: (int(r.wmedian_e2), int(r.total_weight)) for r in df.itertuples(index=False)}
    assert got == {"A": (200, 10), "R": (900, 7)}
