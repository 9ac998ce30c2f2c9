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
