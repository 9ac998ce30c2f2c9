"""Mergeable histogram-quantile tiers and heavy-hitter (top-k) token
tiers: losslessness of tier-up, grid-resolution accuracy of served
quantiles, serve-time truncation semantics, and the non-mergeability
pitfall that justifies storing the untruncated frequency state."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts2g2_spark.plans.rollup import (
    histogram_quantiles, histogram_rollup, histogram_tier_up,
    token_topk_rollup, token_topk_tier_up, topk_serve,
)

LO, HI, NB = 0.0, 100.0, 50  # width 2.0
BASE = 1704067200  # 2024-01-01T00:00:00Z


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(5)
    n = 4000
    pdf = pd.DataFrame({
        "series": rng.choice(["a", "b"], size=n),
        "ts": pd.to_datetime(
            BASE + rng.integers(0, 3 * 3600, size=n), unit="s"),
        "value": np.concatenate([
            rng.uniform(0, 100, size=n - 20),
            rng.uniform(-50, -1, size=10),     # below-lo overflow
            rng.uniform(100, 500, size=10),    # at/above-hi overflow
        ]),
    })
    return spark.createDataFrame(pdf).cache()


def test_histogram_tier_up_lossless(spark, points):
    """1m -> 1h tier-up must equal the 1h histogram built from raw."""
    m1 = histogram_rollup(points, "1m", LO, HI, NB, series_cols=["series"])
    up = histogram_tier_up(m1, "1h", series_cols=["series"])
    direct = histogram_rollup(points, "1h", LO, HI, NB,
                              series_cols=["series"])
    keys = ["series", "bucket_ts", "bin"]
    a = up.orderBy(*keys).toPandas()
    b = direct.orderBy(*keys).toPandas()
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_histogram_quantiles_within_grid_resolution(spark, points):
    """Served quantile q is the upper edge of the ceil(q*n)-rank bin:
    the exact order statistic must lie in (est - width, est] for
    in-grid data (overflow rows clamp to lo/hi)."""
    width = (HI - LO) / NB
    h1 = histogram_rollup(points, "1h", LO, HI, NB, series_cols=["series"])
    qdf = histogram_quantiles(
        h1, [0.5, 0.9], LO, HI, NB, series_cols=["series"]
    ).toPandas()
    raw = points.toPandas()
    raw["bucket_ts"] = raw["ts"].dt.floor("1h")
    for row in qdf.itertuples(index=False):
        vals = raw[(raw["series"] == row.series)
                   & (raw["bucket_ts"] == row.bucket_ts)][
            "value"].sort_values().to_numpy()
        rank = int(np.ceil(row.q * len(vals)))
        exact = vals[rank - 1]
        if LO <= exact < HI:
            assert exact <= row.quantile < exact + width + 1e-9
        else:
            # overflow order statistic clamps to the grid boundary
            assert row.quantile in (LO, HI)


def test_histogram_overflow_bins_clamp(spark):
    pdf = pd.DataFrame({
        "series": ["s"] * 4,
        "ts": pd.to_datetime([BASE] * 4, unit="s"),
        "value": [-5.0, 0.0, 99.9, 250.0],
    })
    df = spark.createDataFrame(pdf)
    h = histogram_rollup(df, "1h", LO, HI, NB, series_cols=["series"])
    bins = sorted(r["bin"] for r in h.collect())
    assert bins[0] == -1 and bins[-1] == NB
    q = histogram_quantiles(h, [0.01, 0.99], LO, HI, NB,
                            series_cols=["series"]).toPandas()
    est = dict(zip(q["q"], q["quantile"]))
    assert est[0.01] == LO   # below-lo mass clamps to lo
    assert est[0.99] == HI   # above-hi mass clamps to hi


@pytest.fixture(scope="module")
def token_points(spark):
    rows = []
    # bucket 1 (hour 0): a x3, b x2, c x1 ; bucket 2 (hour 1): a x1, b x3
    for tok, cnt, hour in [(10, 3, 0), (20, 2, 0), (30, 1, 0),
                           (10, 1, 1), (20, 3, 1)]:
        rows += [("s", BASE + hour * 3600 + i, tok) for i in range(cnt)]
    pdf = pd.DataFrame(rows, columns=["source", "sec", "token"])
    pdf["ts"] = pd.to_datetime(pdf.pop("sec"), unit="s")
    return spark.createDataFrame(pdf).cache()


def test_topk_tier_up_equals_direct(spark, token_points):
    m1 = token_topk_rollup(token_points, "1m", "token",
                           series_cols=["source"])
    up = token_topk_tier_up(m1, "1h", series_cols=["source"])
    direct = token_topk_rollup(token_points, "1h", "token",
                               series_cols=["source"])
    keys = ["source", "bucket_ts", "token"]
    a = up.orderBy(*keys).toPandas()
    b = direct.orderBy(*keys).toPandas()
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_topk_serve_ranking_and_tiebreak(spark, token_points):
    h1 = token_topk_rollup(token_points, "1h", "token",
                           series_cols=["source"])
    top = topk_serve(h1, k=2, series_cols=["source"]).toPandas()
    b0 = top[top["bucket_ts"] == pd.Timestamp(BASE, unit="s")]
    assert b0.sort_values("rnk")["token"].tolist() == [10, 20]
    # day tier: a=4, b=5 -> b first; ties broken by token asc elsewhere
    d1 = token_topk_tier_up(h1, "1d", series_cols=["source"])
    topd = topk_serve(d1, k=2, series_cols=["source"]).toPandas()
    assert topd.sort_values("rnk")["token"].tolist() == [20, 10]


def test_truncated_topk_state_is_not_mergeable(spark, token_points):
    """The pitfall the tier design avoids: merging per-bucket TRUNCATED
    top-1 lists elects token 10 (3+1 visible), while the true day-level
    winner is token 20 (2+3=5) — so the catalog must store the full
    frequency table and truncate only at serve time."""
    h1 = token_topk_rollup(token_points, "1h", "token",
                           series_cols=["source"])
    truncated = topk_serve(h1, k=1, series_cols=["source"]).drop("rnk")
    wrong = topk_serve(
        token_topk_tier_up(truncated, "1d", series_cols=["source"]),
        k=1, series_cols=["source"])
    right = topk_serve(
        token_topk_tier_up(h1, "1d", series_cols=["source"]),
        k=1, series_cols=["source"])
    assert [r["token"] for r in wrong.collect()] == [10]
    assert [r["token"] for r in right.collect()] == [20]


def test_serve_range_histogram_exact_vs_raw(spark):
    """Stitched histogram over an unaligned multi-day [t0, t1) must
    equal the histogram of the raw points in range, bit-for-bit
    (integer counts over disjoint segments — no float drift)."""
    import datetime as dtm

    rng = np.random.default_rng(9)
    n = 6000
    pdf = pd.DataFrame({
        "series": rng.choice(["a", "b"], size=n),
        "ts": pd.to_datetime(
            BASE + rng.integers(0, 5 * 86400, size=n), unit="s"),
        "value": rng.uniform(-10, 120, size=n),
    })
    pts = spark.createDataFrame(pdf).cache()
    t0 = dtm.datetime(2024, 1, 1, 7, 13, 42)
    t1 = dtm.datetime(2024, 1, 4, 22, 4, 5)

    from ts2g2_spark.plans.rollup import serve_range_histogram

    got = serve_range_histogram(
        pts, t0, t1, LO, HI, NB, series_cols=["series"])
    lo_ts = pd.Timestamp(t0)
    hi_ts = pd.Timestamp(t1)
    raw = pdf[(pdf["ts"] >= lo_ts) & (pdf["ts"] < hi_ts)].copy()
    width = (HI - LO) / NB
    raw["bin"] = np.where(
        raw["value"] < LO, -1,
        np.where(raw["value"] >= HI, NB,
                 np.floor((raw["value"] - LO) / width).astype(int)))
    want = (
        raw.groupby(["series", "bin"]).size().rename("cnt").reset_index()
    )
    g = got.orderBy("series", "bin").toPandas()
    w = want.sort_values(["series", "bin"]).reset_index(drop=True)
    assert g["series"].tolist() == w["series"].tolist()
    assert g["bin"].tolist() == w["bin"].tolist()
    assert g["cnt"].tolist() == w["cnt"].tolist()

    # quantiles served over the range agree with the bucketed formula
    from ts2g2_spark.plans.rollup import serve_range_quantiles

    q = serve_range_quantiles(
        pts, t0, t1, [0.5, 0.95], LO, HI, NB, series_cols=["series"]
    ).toPandas()
    for row in q.itertuples(index=False):
        vals = raw[raw["series"] == row.series][
            "value"].sort_values().to_numpy()
        rank = int(np.ceil(row.q * len(vals)))
        exact = vals[rank - 1]
        if LO <= exact < HI:
            assert exact <= row.quantile < exact + width + 1e-9
        else:
            assert row.quantile in (LO, HI)


def test_serve_range_histogram_partial_tier_catalog(spark, points):
    """A catalog missing the 1d tier (retention dropped it) still
    stitches exactly from 1h + 1m + raw."""
    import datetime as dtm

    from ts2g2_spark.plans.rollup import (
        histogram_rollup, histogram_tier_up, serve_range_histogram,
    )

    t0 = dtm.datetime(2024, 1, 1, 0, 10, 30)
    t1 = dtm.datetime(2024, 1, 1, 2, 45, 10)
    m1 = histogram_rollup(points, "1m", LO, HI, NB, series_cols=["series"])
    h1 = histogram_tier_up(m1, "1h", series_cols=["series"])
    got = serve_range_histogram(
        points, t0, t1, LO, HI, NB, tiers={"1m": m1, "1h": h1},
        series_cols=["series"])
    want = serve_range_histogram(
        points, t0, t1, LO, HI, NB, series_cols=["series"])
    keys = ["series", "bin"]
    a = got.orderBy(*keys).toPandas()
    b = want.orderBy(*keys).toPandas()
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])
