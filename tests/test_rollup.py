"""Rollup correctness: kernel vs relational vs duckdb oracle; tier-from-tier
exactness; gap-fill; codec round-trip through Spark; pipeline resume."""

from __future__ import annotations

import numpy as np
import pytest

from ts2g2_spark import datagen
from ts2g2_spark.plans import chunks as chunks_mod
from ts2g2_spark.plans import rollup as rollup_mod
from ts2g2_spark.plans.points import explode_points
from ts2g2_spark.plans.pipeline import RollupPipeline

N_DOCS = 40


@pytest.fixture(scope="module")
def input_df(spark):
    df = datagen.tokenized_sequences(spark, N_DOCS, seed=42)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def gappy_df(spark):
    df = datagen.tokenized_sequences(spark, 10, seed=42, gap_p=0.05)
    df.cache().count()
    return df


def test_datagen_deterministic(spark):
    a = datagen.tokenized_sequences(spark, 5, seed=42).collect()
    b = datagen.tokenized_sequences(
        spark, 5, seed=42, num_partitions=3).collect()
    am = {r.doc_id: (r.tokens, r.source) for r in a}
    bm = {r.doc_id: (r.tokens, r.source) for r in b}
    assert am == bm
    assert all(8 <= len(t) <= 4096 for t, _ in am.values())


def test_kernel_rollup_matches_relational(spark, input_df):
    """Map-only array rollup == groupBy rollup over exploded points."""
    k = rollup_mod.rollup_from_tokens(input_df, tier="1m").toPandas()
    pts = explode_points(input_df)
    r = rollup_mod.rollup_points(pts, "1m", order_col="idx").toPandas()
    for df in (k, r):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert len(k) == len(r)
    assert (k["doc_id"] == r["doc_id"]).all()
    assert (k["bucket_ts"] == r["bucket_ts"]).all()
    for c in ("cnt", "min", "max", "first", "last"):
        assert np.array_equal(k[c].to_numpy(), r[c].to_numpy()), c
    # sums: token values are integers <= 50257 summed over <=60 points, all
    # exactly representable -> exact equality required
    assert np.array_equal(k["sum"].to_numpy(), r["sum"].to_numpy())


def test_relational_from_tokens_matches_kernel(spark, input_df):
    """rollup_from_tokens_relational (posexplode + codegen hash agg — the
    scaling-benchmark path) == the Arrow-kernel path, bit-exact."""
    k = rollup_mod.rollup_from_tokens(input_df, tier="1m").toPandas()
    r = rollup_mod.rollup_from_tokens_relational(
        input_df, tier="1m").toPandas()
    for df in (k, r):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert len(k) == len(r)
    for c in ("doc_id", "bucket_ts", "cnt", "sum", "min", "max", "first",
              "last"):
        assert np.array_equal(k[c].to_numpy(), r[c].to_numpy()), c


def test_tier_from_tier_exact(spark, input_df):
    """Continuous-aggregate contract: 1h from 1m == 1h from raw points."""
    m1 = rollup_mod.rollup_from_tokens(input_df, tier="1m")
    h_from_m = rollup_mod.rollup_tier_up(m1, "1h").toPandas()
    h_direct = rollup_mod.rollup_from_tokens(input_df, tier="1h").toPandas()
    for df in (h_from_m, h_direct):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert len(h_from_m) == len(h_direct)
    for c in ("doc_id", "bucket_ts", "cnt", "min", "max", "first", "last",
              "sum"):
        assert np.array_equal(
            h_from_m[c].to_numpy(), h_direct[c].to_numpy()), c
    d_from_h = rollup_mod.rollup_tier_up(
        rollup_mod.rollup_tier_up(m1, "1h"), "1d").toPandas()
    d_direct = rollup_mod.rollup_from_tokens(input_df, tier="1d").toPandas()
    for df in (d_from_h, d_direct):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert np.array_equal(d_from_h["sum"].to_numpy(),
                          d_direct["sum"].to_numpy())


def test_rollup_vs_duckdb_oracle(spark, input_df):
    import duckdb

    pts = explode_points(input_df).toPandas()
    got = rollup_mod.rollup_from_tokens(input_df, tier="1m").toPandas()
    got = got.sort_values(["doc_id", "bucket_ts"], ignore_index=True)
    ora = duckdb.sql(
        """
        select doc_id, time_bucket(interval '1 minute', ts) bucket_ts,
               count(*) cnt, sum(value) "sum", min(value) "min",
               max(value) "max",
               arg_min(value, idx) "first", arg_max(value, idx) "last"
        from pts group by 1,2 order by 1,2
        """
    ).df()
    assert len(got) == len(ora)
    for c in ("cnt", "min", "max", "first", "last", "sum"):
        assert np.allclose(got[c].to_numpy(), ora[c].to_numpy(),
                           rtol=0, atol=0), c


def test_kernel_gapfill_matches_relational(spark, gappy_df):
    k = rollup_mod.rollup_from_tokens(
        gappy_df, tier="1m", gapfill=True, positions_col="positions"
    ).toPandas()
    sparse = rollup_mod.rollup_from_tokens(
        gappy_df, tier="1m", gapfill=False, positions_col="positions")
    r = rollup_mod.gapfill(sparse, "1m").toPandas()
    for df in (k, r):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert len(k) == len(r)
    assert (k["gapfilled"] == r["gapfilled"]).all()
    assert (k["cnt"] == r["cnt"]).all()
    assert k["gapfilled"].sum() > 0  # gaps actually exercised
    # dense invariant: filled + present == full span per doc
    for doc, g in k.groupby("doc_id"):
        span = (g["bucket_ts"].max() - g["bucket_ts"].min()).total_seconds()
        assert len(g) == span / 60 + 1


def test_chunks_roundtrip_token_equality(spark, input_df):
    ch = chunks_mod.compress_chunks(input_df, chunk_points=512)
    dec = chunks_mod.decompress_chunks(ch).toPandas()
    orig = input_df.toPandas()
    om = {r.doc_id: np.asarray(r.tokens, dtype=np.int32)
          for r in orig.itertuples()}
    dm = {r.doc_id: np.asarray(r.tokens, dtype=np.int32)
          for r in dec.itertuples()}
    assert set(om) == set(dm)
    for k in om:
        assert np.array_equal(om[k], dm[k]), k  # pinned per-row invariant
    # compression actually compresses vs raw 8-byte doubles
    sizes = ch.selectExpr(
        "sum(octet_length(val_gorilla)) vb", "sum(n) n").collect()[0]
    assert sizes.vb < sizes.n * 8


def test_pipeline_resume(spark, input_df, tmp_path):
    root = str(tmp_path / "cat")
    p1 = RollupPipeline(spark, root, run_id="r1")
    # simulate a kill after the 1h tier commit
    p1.run(input_df, "test_input", stop_after="rollup_1h")
    assert [s["stage"] for s in p1.stage_log] == ["rollup_1m", "rollup_1h"]
    before = p1.cat.read("rollup_1h").toPandas().sort_values(
        ["doc_id", "bucket_ts"], ignore_index=True)

    p2 = RollupPipeline(spark, root, run_id="r2")
    out = p2.run(input_df, "test_input")
    skipped = {s["stage"] for s in p2.stage_log if s.get("skipped")}
    assert skipped == {"rollup_1m", "rollup_1h"}  # resumed, not recomputed
    after = out["rollup_1h"].toPandas().sort_values(
        ["doc_id", "bucket_ts"], ignore_index=True)
    assert before.equals(after)  # no duplicates, identical table
    # lineage rows exist for every executed stage
    lin = out["lineage"].toPandas()
    assert {"rollup_1m", "rollup_1h", "rollup_1d", "chunks"} <= set(
        lin["stage"])
    assert (lin["rows"] > 0).any()
    # input change -> full recompute
    p3 = RollupPipeline(spark, root, run_id="r3")
    p3.run(input_df, "different_input_desc")
    assert not any(s.get("skipped") for s in p3.stage_log)


def test_retention(spark, input_df, tmp_path):
    root = str(tmp_path / "cat2")
    p = RollupPipeline(spark, root, run_id="r1")
    out = p.run(input_df, "x")
    n_before = out["rollup_1m"].count()
    # cutoff at base+120s: typical docs (~256 tokens at 1s cadence) keep
    # only their buckets from 120s on
    now = 1704067200 + 100_000
    kept = p.retention(now, horizons={"1m": 99_880, "1h": 10**9,
                                      "1d": 10**9})
    n_after = kept["rollup_1m"].count()
    assert 0 < n_after < n_before
    mins = kept["rollup_1m"].agg({"bucket_ts": "min"}).collect()[0][0]
    assert mins.timestamp() >= now - 99_880


def test_gapfill_linear_interpolates_endpoints(spark):
    """fill='linear': interior buckets sit exactly on the line between
    the gap's endpoints; non-gap rows pass through untouched."""
    import datetime as dt
    import pandas as pd

    TS = dt.datetime
    tier = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 0, 0), 2, 10.0, 1.0, 9.0, 1.0, 9.0, False),
         ("a", TS(2024, 1, 1, 0, 4), 1, 50.0, 50.0, 50.0, 50.0, 50.0,
          False),
         ("a", TS(2024, 1, 1, 0, 5), 1, 60.0, 60.0, 60.0, 60.0, 60.0,
          False),
         ("b", TS(2024, 1, 1, 0, 0), 1, 1.0, 1.0, 1.0, 1.0, 1.0, False)],
        "doc_id string, bucket_ts timestamp, cnt long, sum double, "
        "min double, max double, first double, last double, "
        "gapfilled boolean")
    out = rollup_mod.gapfill(
        tier, "1m", series_cols=["doc_id"], fill="linear"
    ).toPandas().sort_values(["doc_id", "bucket_ts"], ignore_index=True)
    a = out[out.doc_id == "a"].reset_index(drop=True)
    assert list(a.gapfilled) == [False, True, True, True, False, False]
    # sum: 10 -> 50 over 4 steps: 20, 30, 40 at minutes 1..3
    assert list(a["sum"]) == [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
    # min: 1 -> 50: 1 + 49*k/4
    assert list(a["min"])[1:4] == pytest.approx([13.25, 25.5, 37.75])
    assert (a.cnt == [2, 0, 0, 0, 1, 1]).all()
    # series with no gaps untouched
    assert len(out[out.doc_id == "b"]) == 1
    assert not pd.isna(out[out.doc_id == "b"]["sum"]).any()


def test_gapfill_locf_carries_previous_bucket(spark):
    """fill='locf': every interior gap bucket repeats the most recent
    REAL bucket's values exactly (TimescaleDB locf semantics); a later
    real bucket resets the carried value."""
    import datetime as dt

    TS = dt.datetime
    tier = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 0, 0), 2, 10.0, 1.0, 9.0, 1.0, 9.0, False),
         ("a", TS(2024, 1, 1, 0, 3), 1, 50.0, 50.0, 50.0, 50.0, 50.0,
          False),
         ("a", TS(2024, 1, 1, 0, 5), 1, 60.0, 60.0, 60.0, 60.0, 60.0,
          False)],
        "doc_id string, bucket_ts timestamp, cnt long, sum double, "
        "min double, max double, first double, last double, "
        "gapfilled boolean")
    out = rollup_mod.gapfill(
        tier, "1m", series_cols=["doc_id"], fill="locf"
    ).toPandas().sort_values("bucket_ts", ignore_index=True)
    assert list(out.gapfilled) == [False, True, True, False, True, False]
    assert list(out["sum"]) == [10.0, 10.0, 10.0, 50.0, 50.0, 60.0]
    assert list(out["min"]) == [1.0, 1.0, 1.0, 50.0, 50.0, 60.0]
    assert list(out.cnt) == [2, 0, 0, 1, 0, 1]


def test_gapfill_linear_matches_locf_on_real_rows(spark, gappy_df):
    """linear and locf agree on every NON-gap row and emit the same
    bucket spine; only interpolated interior values differ."""
    sparse = rollup_mod.rollup_from_tokens(
        gappy_df, tier="1m", gapfill=False, positions_col="positions")
    lin = rollup_mod.gapfill(sparse, "1m", fill="linear").toPandas()
    loc = rollup_mod.gapfill(sparse, "1m", fill="locf").toPandas()
    key = ["doc_id", "bucket_ts"]
    lin = lin.sort_values(key, ignore_index=True)
    loc = loc.sort_values(key, ignore_index=True)
    assert lin[key + ["cnt", "gapfilled"]].equals(
        loc[key + ["cnt", "gapfilled"]])
    real = ~lin.gapfilled
    assert real.any() and lin.gapfilled.any()
    for c in ("sum", "min", "max", "first", "last"):
        assert (lin.loc[real, c] == loc.loc[real, c]).all()
    # interpolated values are bounded by their gap endpoints (monotone
    # line between two reals) -> never outside the series' global range
    g = lin.gapfilled
    assert lin.loc[g, "sum"].between(
        lin["sum"].min(), lin["sum"].max()).all()


# ----------------------------------------------- tier-stitched serving
def test_decompose_range_covers_exactly():
    rng = np.random.default_rng(7)
    tiers = [86_400_000_000, 3_600_000_000, 60_000_000]
    for _ in range(200):
        t0 = int(rng.integers(0, 10**12))
        t1 = t0 + int(rng.integers(1, 40 * 86_400_000_000))
        segs = rollup_mod.decompose_range(t0, t1, tiers)
        allsegs = sorted(
            s for k in segs for s in segs[k])
        # disjoint, contiguous, exact cover
        assert allsegs[0][0] == t0 and allsegs[-1][1] == t1
        for (a, b), (c, d) in zip(allsegs, allsegs[1:]):
            assert b == c and a < b
        # alignment per tier, and coarser tiers actually used when they fit
        for t in tiers:
            for a, b in segs[t]:
                assert a % t == 0 and b % t == 0 and a < b
        for a, b in segs["raw"]:
            assert b - a < 60_000_000

    with pytest.raises(ValueError):
        rollup_mod.decompose_range(5, 5, tiers)


def test_serve_range_matches_direct(spark):
    import datetime as dt

    import duckdb

    path = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(path)
    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 1, 1)
    for _ in range(4):
        s0 = int(rng.integers(0, 20 * 86400))
        s1 = s0 + int(rng.integers(90, 9 * 86400))
        t0, t1 = (base + dt.timedelta(seconds=s0),
                  base + dt.timedelta(seconds=s1))
        got = rollup_mod.serve_range(
            ev, t0, t1, series_cols=["user_id"], order_col="event_id")
        rows = {r.user_id: r for r in got.collect()}
        exp = duckdb.sql(f"""
            select user_id, count(*) cnt, round(sum(value), 6) sum_val,
                   min(value) min_val, max(value) max_val,
                   arg_min(value, (epoch_us(ts) - 1704067200000000)
                                  * 100000 + event_id) first_val,
                   arg_max(value, (epoch_us(ts) - 1704067200000000)
                                  * 100000 + event_id) last_val,
                   round(sum(value) / count(*), 6) avg_val
            from read_parquet('{path}')
            where ts >= '{t0}' and ts < '{t1}' group by 1
        """).fetchall()
        assert len(exp) > 0 and len(rows) == len(exp)
        for (u, cnt, sv, mn, mx, fv, lv, av) in exp:
            r = rows[u]
            assert (r.cnt, r.min_val, r.max_val) == (cnt, mn, mx), u
            assert (r.first_val, r.last_val) == (fv, lv), u
            assert r.sum_val == pytest.approx(sv, abs=2e-6), u
            assert r.avg_val == pytest.approx(av, abs=2e-6), u


def test_serve_range_subminute_and_aligned(spark):
    import datetime as dt

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = dt.datetime(2024, 1, 2)
    # sub-minute: raw-only path
    sub = rollup_mod.serve_range(
        ev, base, base + dt.timedelta(seconds=30),
        series_cols=["user_id"], order_col="event_id")
    direct = ev.where(
        (ev.ts >= base.isoformat()) &
        (ev.ts < (base + dt.timedelta(seconds=30)).isoformat()))
    assert sub.selectExpr("sum(cnt)").first()[0] == direct.count() \
        or direct.count() == 0
    # day-aligned: no raw segments, pure 1d tier
    segs = rollup_mod.decompose_range(
        int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
        int((base + dt.timedelta(days=3)).replace(
            tzinfo=dt.timezone.utc).timestamp() * 1e6),
        [86_400_000_000, 3_600_000_000, 60_000_000])
    assert segs["raw"] == [] and segs[3_600_000_000] == [] \
        and segs[60_000_000] == []
    day = rollup_mod.serve_range(
        ev, base, base + dt.timedelta(days=3),
        series_cols=["user_id"], order_col="event_id")
    d2 = ev.where((ev.ts >= base.isoformat()) &
                  (ev.ts < (base + dt.timedelta(days=3)).isoformat()))
    assert day.selectExpr("sum(cnt)").first()[0] == d2.count()


# ----------------------------------------------- HLL distinct tiers
def test_distinct_rollup_exact_regime_and_tier_up(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    m1 = rollup_mod.distinct_rollup(ev, "1m", "user_id",
                                    series_cols=["event_type"])
    h1 = rollup_mod.distinct_tier_up(m1, "1h", series_cols=["event_type"])
    d1 = rollup_mod.distinct_tier_up(h1, "1d", series_cols=["event_type"])
    import pyspark.sql.functions as F
    for df, unit in ((h1, "hour"), (d1, "day")):
        got = {(r.event_type, r.bucket_ts): r.n_distinct
               for r in df.collect()}
        exp = {(r.event_type, r.bucket_ts): r.n
               for r in ev.groupBy(
                   "event_type",
                   F.date_trunc(unit, "ts").alias("bucket_ts"))
               .agg(F.countDistinct("user_id").alias("n")).collect()}
        assert got == exp  # sparse exact regime at this cardinality


def test_distinct_sketch_error_bound_beyond_exact_regime(spark):
    import pyspark.sql.functions as F
    n = 200_000
    df = spark.range(n).select(
        F.lit("2024-01-01 00:00:30").cast("timestamp").alias("ts"),
        F.col("id").alias("k"))
    est = rollup_mod.distinct_rollup(df, "1h", "k").first().n_distinct
    assert abs(est - n) / n < 0.05  # lgk=12 -> ~1.6% RSE
    # union of disjoint shards == direct sketch estimate
    sharded = spark.range(n).select(
        F.lit("2024-01-01 00:00:30").cast("timestamp").alias("ts"),
        (F.col("id") % 7).alias("shard"), F.col("id").alias("k"))
    m = rollup_mod.distinct_rollup(sharded, "1m", "k",
                                   series_cols=["shard"])
    u = rollup_mod.distinct_tier_up(m, "1h").first().n_distinct
    assert u == est


def test_serve_range_supplied_tiers_with_gapfill_and_partial_catalog(spark):
    import datetime as dt

    import duckdb

    path = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(path)
    # production path: MATERIALIZED tier frames, the 1m tier gap-filled
    # (serve_range must ignore gapfilled marker rows)
    m1 = rollup_mod.rollup_points(ev, "1m", series_cols=["user_id"],
                                  order_col="event_id")
    m1g = rollup_mod.gapfill(m1, "1m", series_cols=["user_id"])
    h1 = rollup_mod.rollup_tier_up(m1, "1h", series_cols=["user_id"])
    d1 = rollup_mod.rollup_tier_up(h1, "1d", series_cols=["user_id"])
    assert m1g.where("gapfilled").count() > 0  # gap rows exercised
    t0 = dt.datetime(2024, 1, 3, 5, 37, 21)
    t1 = dt.datetime(2024, 1, 10, 17, 11, 3)

    def direct():
        return duckdb.sql(f"""
            select user_id, count(*) cnt, round(sum(value), 6) sum_val
            from read_parquet('{path}')
            where ts >= '{t0}' and ts < '{t1}' group by 1
        """).fetchall()

    for catalog in ({"1m": m1g, "1h": h1, "1d": d1},
                    {"1m": m1g, "1h": h1}):  # partial: 1d dropped
        got = {r.user_id: r for r in rollup_mod.serve_range(
            ev, t0, t1, tiers=catalog, series_cols=["user_id"],
            order_col="event_id").collect()}
        for (u, cnt, sv) in direct():
            assert got[u].cnt == cnt, (u, catalog.keys())
            assert got[u].sum_val == pytest.approx(sv, abs=2e-6)

    with pytest.raises(ValueError, match="unknown tier"):
        rollup_mod.serve_range(ev, t0, t1, tiers={"5s": m1},
                               series_cols=["user_id"])


# ---------------------------------------------------- late-data refresh

def test_refresh_tier_equals_full_recompute(spark, input_df):
    """refresh(state(base), late) == rollup(base ∪ late) exactly.

    Token values are integers, so even the merged sums are exact doubles —
    full bit-equality is required on every column.  The late split is
    idx%17==3 (scattered late points) PLUS one whole doc (every one of its
    buckets is brand-new at refresh time, exercising the delta-only-bucket
    union path)."""
    from pyspark.sql import functions as F

    pts = explode_points(input_df)
    some_doc = pts.select("doc_id").orderBy("doc_id").first().doc_id
    is_late = (F.pmod(F.col("idx"), F.lit(17)) == 3) | \
        (F.col("doc_id") == some_doc)
    state = rollup_mod.rollup_state(
        pts.where(~is_late), "1m", okey=F.col("idx"))
    refreshed = rollup_mod.refresh_tier(
        state, pts.where(is_late), "1m", okey=F.col("idx"))
    got = rollup_mod.finalize_state(refreshed).toPandas()
    want = rollup_mod.rollup_points(pts, "1m", order_col="idx").toPandas()
    for df in (got, want):
        df.sort_values(["doc_id", "bucket_ts"], inplace=True,
                       ignore_index=True)
    assert len(got) == len(want)
    # the late doc's buckets exist only in the delta — they must be present
    assert (got["doc_id"] == some_doc).any()
    for c in ("doc_id", "source", "bucket_ts", "cnt", "sum", "min", "max",
              "first", "last", "gapfilled"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_refresh_tier_untouched_rows_pass_through(spark, input_df):
    """Tier rows whose (series, bucket) the late batch does not name come
    back byte-identical — including the stored first/last order keys —
    proving they never went through the merge aggregate."""
    from pyspark.sql import functions as F

    pts = explode_points(input_df)
    is_late = F.pmod(F.col("idx"), F.lit(17)) == 3
    state = rollup_mod.rollup_state(
        pts.where(~is_late), "1m", okey=F.col("idx"))
    delta = rollup_mod.rollup_state(
        pts.where(is_late), "1m", okey=F.col("idx"))
    merged = rollup_mod.merge_tier_states(state, delta)
    dk = delta.select("doc_id", "source", "bucket_ts")
    keys = ["doc_id", "source", "bucket_ts"]
    got = merged.join(dk, keys, "left_anti").toPandas()
    want = state.join(dk, keys, "left_anti").toPandas()
    for df in (got, want):
        df.sort_values(keys, inplace=True, ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_refresh_tier_plan_broadcasts_key_split(spark, input_df):
    """The untouched/touched split is a broadcast anti/semi join pair —
    the big tier is never shuffled by the refresh."""
    from pyspark.sql import functions as F

    pts = explode_points(input_df)
    is_late = F.pmod(F.col("idx"), F.lit(17)) == 3
    state = rollup_mod.rollup_state(
        pts.where(~is_late), "1m", okey=F.col("idx"))
    refreshed = rollup_mod.refresh_tier(
        state, pts.where(is_late), "1m", okey=F.col("idx"))
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_tier_join_is_exchange_free(spark, tmp_path):
    """Tiers written bucketed on the series key join against a
    same-bucketed dim with NO Exchange on either side; the identical
    frames read back as plain parquet paths (bucket spec lost) shuffle
    both sides — same rows either way."""
    from pyspark.sql import functions as F

    from ts2g2_spark.catalog import Catalog

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tier = rollup_mod.rollup_points(
        ev, "1m", series_cols=["user_id"], order_col="event_id")
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    cat = Catalog(str(tmp_path), spark)
    cat.write_bucketed(tier, "tier_1m_b", ["user_id"], 8,
                       sort_cols=["user_id"])
    cat.write_bucketed(dim, "user_dim_b", ["user_id"], 8,
                       sort_cols=["user_id"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cat.read_bucketed("tier_1m_b").join(
            cat.read_bucketed("user_dim_b"), "user_id")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # bucketed groupBy on the bucket key also skips the exchange
        g = cat.read_bucketed("tier_1m_b").groupBy("user_id").agg(
            F.sum("cnt").alias("c"))
        g.count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in gplan
        # contrast: path reads lose the bucket spec -> shuffle comes back
        t2 = spark.read.parquet(str(tmp_path / "tier_1m_b"))
        d2 = spark.read.parquet(str(tmp_path / "user_dim_b"))
        j2 = t2.join(d2, "user_id")
        assert j2.count() == n
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_table_names_are_sanitized(spark, tmp_path):
    """Names legal as path segments elsewhere in Catalog (hyphens,
    dots) must work for bucketed tables too — identifiers are data,
    never SQL text."""
    from ts2g2_spark.catalog import Catalog

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = ev.groupBy("user_id").count()
    cat = Catalog(str(tmp_path), spark)
    cat.write_bucketed(dim, "tier-1m.dim", ["user_id"], 4)
    got = cat.read_bucketed("tier-1m.dim")
    assert got.count() == dim.count()
    # same sanitized prefix, different raw names -> distinct tables
    cat.write_bucketed(dim.limit(3), "tier_1m.dim", ["user_id"], 4)
    assert cat.read_bucketed("tier_1m.dim").count() == 3
    assert cat.read_bucketed("tier-1m.dim").count() == dim.count()
