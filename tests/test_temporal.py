"""As-of join (operators/temporal.py) vs a brute-force pandas oracle,
plus plan-shape assertions (single key-shuffle, no range join)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts2g2_spark.operators.temporal import asof_join

TS = dt.datetime


def _frames(spark, seed=7, n_left=400, n_right=150, n_keys=9):
    rng = np.random.default_rng(seed)
    base = TS(2024, 1, 1)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": [base + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 50_000, n_left)],
        "lv": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "rts": [base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 50_000, n_right)],
        "rv": rng.normal(size=n_right).round(3),
    })
    # asof contract: right unique per (key, ts)
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    return left, right


def _oracle(left, right, tolerance_s=None):
    out = []
    for row in left.itertuples(index=False):
        cand = right[(right.k == row.k) & (right.rts <= row.ts)]
        if tolerance_s is not None:
            cand = cand[cand.rts >= row.ts - dt.timedelta(
                seconds=tolerance_s)]
        rv = None
        if len(cand):
            rv = float(cand.sort_values("rts").iloc[-1].rv)
        out.append((int(row.k), row.ts, float(row.lv), rv))
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@pytest.mark.parametrize("tolerance_s", [None, 3600])
def test_asof_matches_bruteforce(spark, tolerance_s):
    left, right = _frames(spark)
    lsdf = spark.createDataFrame(left)
    rsdf = spark.createDataFrame(right)
    got = asof_join(lsdf, rsdf, ["k"], "ts", "rts",
                    tolerance_s=tolerance_s)
    rows = sorted(
        ((r.k, r.ts, r.lv, r.rv) for r in got.collect()),
        key=lambda t: (t[0], t[1], t[2]))
    assert rows == _oracle(left, right, tolerance_s)


def test_asof_inclusive_and_missing(spark):
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5), 1.0), (2, TS(2024, 1, 1), 2.0)],
        "k int, ts timestamp, lv double")
    rsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5), 9.0)],
        "k int, rts timestamp, rv double")
    got = {(r.k): r.rv for r in
           asof_join(lsdf, rsdf, ["k"], "ts", "rts").collect()}
    assert got[1] == 9.0  # right row at EQUAL ts matches (inclusive)
    assert got[2] is None  # no match -> left row survives with null


def test_asof_name_collision_suffix(spark):
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 5.0)], "k int, ts timestamp, v double")
    rsdf = spark.createDataFrame(
        [(1, TS(2023, 12, 31), 7.0)], "k int, rts timestamp, v double")
    out = asof_join(lsdf, rsdf, ["k"], "ts", "rts")
    assert set(out.columns) == {"k", "ts", "v", "v_r"}
    row = out.collect()[0]
    assert (row.v, row.v_r) == (5.0, 7.0)


def test_asof_plan_single_shuffle_no_range_join(spark):
    left, right = _frames(spark)
    plan = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        ["k"], "ts", "rts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, never a join operator
    assert plan.count("Exchange hashpartitioning(k") <= 2  # one per side


def test_asof_empty_right_payload(spark):
    """Right side with only key+ts (existence/alignment check) must not
    crash on DDL construction and must return every left row."""
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 10), 1.0)], "k long, ts timestamp, lv double")
    rsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5))], "k long, rts timestamp")
    out = asof_join(lsdf, rsdf, ["k"], "ts", "rts").collect()
    assert len(out) == 1 and out[0].lv == 1.0
    assert set(out[0].asDict()) == {"k", "ts", "lv"}


def test_asof_odd_column_names(spark):
    """Left/right payload names with spaces or dashes must be quoted in
    the null-struct DDL and resolved via getField on output."""
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 10), 1.5)],
        "k long, ts timestamp, `my val` double")
    rsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5), 2.5)],
        "k long, rts timestamp, `r-v` double")
    row = asof_join(lsdf, rsdf, ["k"], "ts", "rts").collect()[0]
    d = row.asDict()
    assert d["my val"] == 1.5 and d["r-v"] == 2.5


def test_asof_suffix_collides_with_existing_left_column(spark):
    """Left already owns v AND v_r: the right payload v must suffix past
    both (v_r_r), never emitting duplicate output names."""
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 10), 1.0, 2.0)],
        "k long, ts timestamp, v double, v_r double")
    rsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5), 9.0)],
        "k long, rts timestamp, v double")
    out = asof_join(lsdf, rsdf, ["k"], "ts", "rts")
    assert len(out.columns) == len(set(out.columns))
    row = out.collect()[0].asDict()
    assert row["v"] == 1.0 and row["v_r"] == 2.0 and row["v_r_r"] == 9.0


def test_asof_empty_left_payload(spark):
    """Left with only key+ts still round-trips (empty _l struct)."""
    lsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 10))], "k long, ts timestamp")
    rsdf = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 5), 3.0)], "k long, rts timestamp, rv double")
    row = asof_join(lsdf, rsdf, ["k"], "ts", "rts").collect()[0]
    assert row.rv == 3.0


# ------------------------------------------------------- interval_join
def _intervals(seed, n, n_keys, max_len_s):
    rng = np.random.default_rng(seed)
    base = TS(2024, 1, 1)
    start = rng.integers(0, 100_000, n)
    length = rng.integers(0, max_len_s, n)
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "start_ts": [base + dt.timedelta(seconds=int(s)) for s in start],
        "end_ts": [base + dt.timedelta(seconds=int(s + l))
                   for s, l in zip(start, length)],
        "iv": np.arange(n, dtype=np.int64),
    })


def _overlap_oracle(l, r):
    pairs = set()
    for a in l.itertuples(index=False):
        for b in r.itertuples(index=False):
            if (a.k == b.k and a.start_ts <= b.end_ts
                    and b.start_ts <= a.end_ts):
                pairs.add((a.k, a.iv, b.iv))
    return pairs


@pytest.mark.parametrize("bucket_s", [60, 3600, 86400])
def test_interval_join_matches_bruteforce(spark, bucket_s):
    # pair coverage must be IDENTICAL at any grid size — the grid is an
    # execution detail, never a semantic
    from ts2g2_spark.operators.temporal import interval_join

    l = _intervals(seed=5, n=120, n_keys=5, max_len_s=5000)
    r = _intervals(seed=6, n=90, n_keys=5, max_len_s=5000)
    got = interval_join(
        spark.createDataFrame(l), spark.createDataFrame(r), ["k"],
        bucket_s=bucket_s)
    rows = got.collect()
    assert {(x.k, x.iv, x.iv_r) for x in rows} == _overlap_oracle(l, r)
    assert len(rows) == len(set((x.k, x.iv, x.iv_r) for x in rows))


def test_interval_join_edges(spark):
    from ts2g2_spark.operators.temporal import interval_join

    base = TS(2024, 1, 1)

    def iv(k, s, e, tag):
        return (k, base + dt.timedelta(seconds=s),
                base + dt.timedelta(seconds=e), tag)

    schema = "k long, start_ts timestamp, end_ts timestamp, iv string"
    # touching endpoints overlap (closed intervals); disjoint don't;
    # zero-length intervals join; key mismatch never joins
    l = spark.createDataFrame(
        [iv(1, 0, 100, "a"), iv(1, 500, 500, "b"), iv(2, 0, 100, "c")],
        schema)
    r = spark.createDataFrame(
        [iv(1, 100, 200, "x"), iv(1, 201, 300, "y"), iv(1, 500, 500, "z"),
         iv(3, 0, 100, "w")], schema)
    got = {(x.iv, x.iv_r) for x in
           interval_join(l, r, ["k"], bucket_s=60).collect()}
    assert got == {("a", "x"), ("b", "z")}

    # empty sides
    empty = l.where("1=0")
    assert interval_join(empty, r, ["k"]).count() == 0
    assert interval_join(l, empty, ["k"]).count() == 0

    with pytest.raises(ValueError, match="bucket_s"):
        interval_join(l, r, ["k"], bucket_s=0)

    bad = spark.createDataFrame([iv(1, 100, 50, "neg")], schema)
    with pytest.raises(Exception, match="end < start"):
        interval_join(bad, r, ["k"]).collect()


def test_interval_join_internal_name_collision(spark):
    # payload columns named like the internal staging columns must pass
    # through untouched (review fix: fresh internal names)
    from ts2g2_spark.operators.temporal import interval_join

    base = TS(2024, 1, 1)
    l = spark.createDataFrame(
        [(1, base, base + dt.timedelta(seconds=100), "keepL", 7)],
        "k long, start_ts timestamp, end_ts timestamp, _b string, _ls long")
    r = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=50),
          base + dt.timedelta(seconds=150), "keepR", 9)],
        "k long, start_ts timestamp, end_ts timestamp, _rs string, _b long")
    rows = interval_join(l, r, ["k"], bucket_s=60).collect()
    assert len(rows) == 1
    row = rows[0].asDict()
    assert row["_b"] == "keepL" and row["_ls"] == 7
    assert row["_rs"] == "keepR" and row["_b_r"] == 9


def test_interval_join_plan_is_equi_join(spark):
    # the point of the grid: no BroadcastNestedLoopJoin / CartesianProduct
    from ts2g2_spark.operators.temporal import interval_join

    l = spark.createDataFrame(_intervals(seed=8, n=50, n_keys=3,
                                         max_len_s=2000))
    r = spark.createDataFrame(_intervals(seed=9, n=50, n_keys=3,
                                         max_len_s=2000))
    plan = interval_join(l, r, ["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_state_durations_islands(spark):
    from ts2g2_spark.operators.temporal import state_durations

    # one user: low(0s) low(10s) high(25s) low(30s) -> islands
    # low[0,25) = 25s, high[25,30) = 5s, low[30,30) = 0s (series end)
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_id": [1, 2, 3, 4],
        "ts": [_ts(0), _ts(10), _ts(25), _ts(30)],
        "value": [1.0, 2.0, 99.0, 3.0],
    })
    out = state_durations(spark.createDataFrame(pdf), low=15.0,
                          high=70.0, order_col="event_id")
    rows = {r["state"]: r for r in out.collect()}
    assert rows["low"]["n_intervals"] == 2
    assert rows["low"]["total_us"] == 25_000_000
    assert rows["low"]["longest_us"] == 25_000_000
    assert rows["low"]["first_enter"] == _ts(0)
    assert rows["high"]["n_intervals"] == 1
    assert rows["high"]["total_us"] == 5_000_000
    assert rows["high"]["first_enter"] == _ts(25)


def test_state_durations_tiebreaker_and_state_col(spark):
    from ts2g2_spark.operators.temporal import state_durations

    # duplicate timestamps: event_id breaks the tie -> b,a at t0 then
    # a at t10 gives islands b[0,0) a[0,10) a[10,10)-merged = a x1
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1],
        "event_id": [2, 1, 3],
        "ts": [_ts(0), _ts(0), _ts(10)],
        "st": ["a", "b", "a"],
    })
    out = state_durations(spark.createDataFrame(pdf), state_col="st",
                          order_col="event_id")
    rows = {r["state"]: r for r in out.collect()}
    assert rows["b"]["n_intervals"] == 1 and rows["b"]["total_us"] == 0
    assert rows["a"]["n_intervals"] == 1
    assert rows["a"]["total_us"] == 10_000_000

    with pytest.raises(ValueError, match="state_col or both"):
        state_durations(spark.createDataFrame(pdf), low=1.0)


def test_state_durations_empty_and_single(spark):
    from ts2g2_spark.operators.temporal import state_durations

    pdf = pd.DataFrame({
        "user_id": [1], "event_id": [1], "ts": [_ts(0)],
        "value": [50.0]})
    df = spark.createDataFrame(pdf)
    out = state_durations(df, low=15.0, high=70.0,
                          order_col="event_id").collect()
    assert len(out) == 1 and out[0]["state"] == "mid"
    assert out[0]["total_us"] == 0 and out[0]["n_intervals"] == 1
    assert state_durations(df.limit(0), low=1.0, high=2.0,
                           order_col="event_id").count() == 0
