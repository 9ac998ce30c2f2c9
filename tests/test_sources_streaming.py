"""Sources (S1/S4) and the Structured-Streaming 1m-tier seam."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ts2g2_spark.plans import rollup as R
from ts2g2_spark.sources import io as src
from ts2g2_spark.streaming import ingest


def test_read_csv_series(spark, tmp_path):
    p = tmp_path / "prices.csv"
    p.write_text(
        "Date,Open,Close\n"
        "2024-01-01,1.0,10.5\n"
        "2024-01-02,2.0,11.0\n"
        "2024-01-03,3.0,9.75\n")
    df = src.read_csv_series(spark, str(p), "Close", series_key="px")
    rows = df.orderBy("idx").collect()
    assert [r.value for r in rows] == [10.5, 11.0, 9.75]
    assert rows[0].ts.year == 2024
    assert rows[0].series_key == "px"


def test_series_from_array(spark):
    df = src.series_from_array(spark, [1, 2, 3], "a")
    assert df.collect()[0].values == [1.0, 2.0, 3.0]


def test_streaming_rollup_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk_points(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )

    # append-mode + watermark: a window emits ONLY once the watermark
    # (max event time - delay) passes its end — so the first drain of a
    # 58-minute batch under a 1-hour watermark emits nothing yet.  That is
    # the streaming contract, not a bug: completeness is
    # watermark-bounded.
    mk_points(0, 500).write.mode("append").parquet(in_dir)
    tier = ingest.streaming_rollup_1m(
        ingest.stream_points(spark, in_dir))
    ingest.run_available_now(tier, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    assert got.count() == 0

    # second batch ~27h later pushes the watermark far past every batch-1
    # window; the next drain must emit ALL batch-1 buckets exactly once,
    # matching the batch rollup bit-for-bit
    mk_points(100000, 100200).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_rollup_1m(ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    want1 = R.rollup_points(mk_points(0, 500), "1m").drop("first", "last")
    cols = ["doc_id", "bucket_ts", "cnt", "sum", "min", "max"]
    assert got2.count() == want1.count()
    assert got2.select(*cols).exceptAll(want1.select(*cols)).count() == 0
    assert want1.select(*cols).exceptAll(got2.select(*cols)).count() == 0


# ------------------------------------------------------------- S2 .ts
def test_read_ts_fixture(spark):
    from ts2g2_spark.sources import io

    df = io.read_ts(spark, "tests/fixtures/sample.ts")
    rows = {(r.case_id, r.dim): r for r in df.collect()}
    assert len(rows) == 6  # 3 cases x 2 dims
    assert rows[(0, "dim_0")].values == [1.0, 2.0, 3.5, 2.5]
    assert rows[(1, "dim_1")].values == [7.5, 6.5, 5.5, 4.5]
    assert rows[(0, "dim_0")].label == "up"
    assert rows[(1, "dim_0")].label == "down"


def test_ts_first_series_matches_reference_surface(spark):
    """Reference TsFile.from_ts returns X['dim_0'][0] (tsg_io/input.py:
    47-49) — the first case's dim_0 series."""
    from ts2g2_spark.sources import io

    row = io.ts_first_series(spark, "tests/fixtures/sample.ts").collect()
    assert len(row) == 1
    assert row[0].values == [1.0, 2.0, 3.5, 2.5]


def test_read_ts_no_label(spark, tmp_path):
    from ts2g2_spark.sources import io

    p = tmp_path / "nolabel.ts"
    p.write_text("@problemName x\n@classLabel false\n@data\n"
                 "1.0,2.0:3.0,4.0\n5.0,6.0:7.0,8.0\n")
    rows = {(r.case_id, r.dim): r for r in
            io.read_ts(spark, str(p)).collect()}
    assert rows[(0, "dim_1")].values == [3.0, 4.0]
    assert rows[(1, "dim_0")].label is None


def test_streaming_stateful_rollup_matches_batch(spark, tmp_path):
    """applyInPandasWithState tier: finalized buckets (emitted on
    event-time timeout) match the batch rollup INCLUDING first/last."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk_points(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )

    mk_points(0, 500).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_rollup_1m_stateful(
            ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    # first drain: watermark has not passed any bucket end yet
    assert spark.read.parquet(out_dir).count() == 0

    # a much-later batch pushes the watermark past every batch-1 bucket:
    # the timeout fires and emits each finalized bucket exactly once
    mk_points(100000, 100200).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_rollup_1m_stateful(
            ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    want = R.rollup_points(mk_points(0, 500), "1m")
    cols = ["doc_id", "bucket_ts", "cnt", "sum", "min", "max",
            "first", "last"]
    assert got.count() == want.count()
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0


# ------------------------------------------------------------- S3 XML
def test_read_financial_xml(spark):
    """Reference FundamentalsReportFinancialStatements semantics
    (tsg_io/input.py:61-100): lineItem[@coaCode=item] under the chosen
    season's periods, document order, floats."""
    from ts2g2_spark.sources import io

    annual = io.read_financial_xml(
        spark, "tests/fixtures/report.xml", "SREV", series_key="rev")
    rows = annual.orderBy("idx").collect()
    assert [r.value for r in rows] == [100.5, 120.25, 131.0]
    assert rows[0].series_key == "rev"

    interim = io.read_financial_xml(
        spark, "tests/fixtures/report.xml", "SREV", season="Interim")
    assert [r.value for r in interim.orderBy("idx").collect()] == [60.5]

    other = io.read_financial_xml(
        spark, "tests/fixtures/report.xml", "NINC")
    assert [r.value for r in other.orderBy("idx").collect()] == [10.0, 12.5]


def test_stream_dedup(spark, tmp_path):
    """Duplicates within a batch AND across batches (inside the
    watermark) are dropped; output equals batch-distinct."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 50)).alias("doc_id"),
            F.lit("s0").alias("source"),
            F.timestamp_seconds(1704067200 + (F.col("id") % 50)).alias("ts"),
            F.lit(1.0).alias("value"),
        )

    # 200 rows -> 50 distinct (doc_id, ts) keys, duplicated 4x in-batch
    mk(0, 200).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.stream_dedup(ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 50

    # the same keys again in a second batch (same event times, within
    # the watermark): all suppressed by carried state
    mk(0, 100).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.stream_dedup(ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 50


def test_streaming_tier_composes_with_tier_up(spark, tmp_path):
    """The docstring claim 'rollup_tier_up composes on top' made
    evidence: 1h tier derived from the STREAMED stateful 1m tier equals
    the 1h tier computed from raw in batch (including first/last)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk_points(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 11).alias("ts"),
            (F.col("id") % 9).cast("double").alias("value"),
        )

    mk_points(0, 400).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_rollup_1m_stateful(
            ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    # push the watermark far past batch 1 so its buckets finalize
    mk_points(100000, 100100).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_rollup_1m_stateful(
            ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)

    streamed_1m = spark.read.parquet(out_dir)
    got_1h = R.rollup_tier_up(streamed_1m, "1h")
    want_1h = R.rollup_tier_up(
        R.rollup_points(mk_points(0, 400), "1m"), "1h")
    cols = ["doc_id", "bucket_ts", "cnt", "sum", "min", "max",
            "first", "last"]
    assert got_1h.count() == want_1h.count()
    assert got_1h.select(*cols).exceptAll(
        want_1h.select(*cols)).count() == 0


# ------------------------------------------------- streaming corpus clean
def test_streaming_clean_matches_batch_gates(spark, tmp_path):
    """The gate projection on a stream selects exactly the docs the
    batch quality_gate selects, and exact dups are suppressed within a
    micro-batch and across micro-batches inside the watermark."""
    from ts2g2_spark.plans.corpus import quality_gate
    from ts2g2_spark.streaming import corpus as scorpus

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")
    os.makedirs(in_dir)

    en = "the cat and of to is that with"
    good = [(i, f"{en} " + " ".join(f"w{i}x{j}" for j in range(22)), "s",)
            for i in range(4)]
    bad = [(10, "too short", "s"), (11, "the " * 40 + en, "s")]
    dup = [(20, good[0][1], "s")]  # exact dup of doc 0

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).select("*", F.timestamp_seconds(
            F.lit(1704067200) + F.col("doc_id")).alias("ingest_ts"))

    mk(good + bad + dup).coalesce(1).write.mode("append").parquet(in_dir)
    scorpus.run_available_now(
        scorpus.streaming_clean(
            scorpus.stream_docs(spark, in_dir), max_dup_2gram_frac=0.5),
        out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    # one survivor per distinct content hash; gates match batch
    want_gate = quality_gate(mk(good + bad), max_dup_2gram_frac=0.5)
    assert (sorted(r["content_hash"] for r in
                   got.select("content_hash").collect())
            == sorted(r for (r,) in want_gate.select(F.md5("text"))
                      .distinct().collect()))
    assert got.count() == len(good)  # bad gated out, dup suppressed

    # batch 2: re-send doc 0's text (same hash, inside the watermark)
    # plus one genuinely new doc -> only the new doc appears
    new = [(30, f"{en} " + " ".join(f"z{j}" for j in range(22)), "s")]
    mk(dup + new).coalesce(1).write.mode("append").parquet(in_dir)
    scorpus.run_available_now(
        scorpus.streaming_clean(
            scorpus.stream_docs(spark, in_dir), max_dup_2gram_frac=0.5),
        out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(good) + 1
    assert {r["doc_id"] for r in got2.collect()} >= {30}


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from ts2g2_spark.operators.eventseq import sessionize

    in_dir = str(tmp_path / "sess_in")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(in_dir)

    def mk_events(lo, hi, base=1704067200):
        # scrambled offsets on a 37s grid: per-user sorted gaps are
        # multiples of 37 (mix of < and > the 120s threshold), and 120
        # is NOT a multiple of 37, so the half-open boundary divergence
        # (see streaming_sessionize docstring) cannot bite
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                base + ((F.col("id") * 7919) % 2700) * 37).alias("ts"),
            (F.col("id") % 5).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.col("id").cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        )

    # ONE file per drain: the file source's watermark advances between
    # micro-batches, and ts is scrambled across ids, so a multi-file
    # batch would drop rows older than a prior micro-batch's watermark
    mk_events(0, 400).coalesce(1).write.mode("append").parquet(in_dir)
    sess = ingest.streaming_sessionize(
        ingest.stream_events(spark, in_dir), gap_s=120)
    ingest.run_available_now(sess, out_dir, ckpt)
    # push the watermark past every first-batch session, then drain again
    mk_events(100000, 100010, base=1704067200 + 500_000).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_sessionize(
            ingest.stream_events(spark, in_dir), gap_s=120),
        out_dir, ckpt)

    # batch-2's own early-ending sessions also finalize in the second
    # drain (the watermark passes them) — compare the batch-1 range only
    got = spark.read.parquet(out_dir).where(
        F.col("start_ts") < F.timestamp_seconds(F.lit(1704067200 + 500_000)))
    want = sessionize(mk_events(0, 400), gap_s=120,
                      order_col="event_id")
    cols = ["user_id", "start_ts", "end_ts", "n_events", "duration_us"]
    w = want.select(F.col("user_id"), F.col("start_ts"),
                    F.col("end_ts"), F.col("n_events"),
                    F.col("duration_us"))
    assert got.count() == w.count() > 0
    assert got.select(*cols).exceptAll(w).count() == 0
    assert w.exceptAll(got.select(*cols)).count() == 0


def test_streaming_distinct_matches_batch_and_tiers_up(spark, tmp_path):
    from ts2g2_spark.plans import rollup as R2

    in_dir = str(tmp_path / "din")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    os.makedirs(in_dir)

    def mk_points(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 11).cast("double").alias("value"),
        )

    mk_points(0, 500).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_distinct_1m(ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 0  # watermark holds

    mk_points(100000, 100200).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_distinct_1m(ingest.stream_points(spark, in_dir)),
        out_dir, ckpt)
    got = spark.read.parquet(out_dir)

    want = R2.distinct_rollup(mk_points(0, 500), "1m", "value",
                              series_cols=["doc_id", "source"])
    assert got.count() == want.count() > 0
    g = {(r.doc_id, r.bucket_ts): r.n_distinct for r in got.collect()}
    w = {(r.doc_id, r.bucket_ts): r.n_distinct for r in want.collect()}
    assert g == w
    # sparse exact regime: estimates equal exact distincts
    exact = {(r.doc_id, r.b): r.n for r in mk_points(0, 500).groupBy(
        "doc_id", F.date_trunc("minute", "ts").alias("b")).agg(
        F.countDistinct("value").alias("n")).collect()}
    assert g == exact
    # batch tier-up composes on the STREAMED sketch state
    h_stream = R2.distinct_tier_up(got, "1h",
                                   series_cols=["doc_id", "source"])
    h_direct = R2.distinct_rollup(mk_points(0, 500), "1h", "value",
                                  series_cols=["doc_id", "source"])
    hs = {(r.doc_id, r.bucket_ts): r.n_distinct for r in h_stream.collect()}
    hd = {(r.doc_id, r.bucket_ts): r.n_distinct for r in h_direct.collect()}
    assert hs == hd


def test_streaming_histogram_matches_batch_and_tiers_up(spark, tmp_path):
    from ts2g2_spark.plans import rollup as R3

    in_dir = str(tmp_path / "hin")
    out_dir = str(tmp_path / "hout")
    ckpt = str(tmp_path / "hckpt")
    os.makedirs(in_dir)
    LO, HI, NB = 0.0, 11.0, 11

    def mk_points(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 11).cast("double").alias("value"),
        )

    mk_points(0, 500).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_histogram_1m(
            ingest.stream_points(spark, in_dir), LO, HI, NB),
        out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 0  # watermark holds

    mk_points(100000, 100200).write.mode("append").parquet(in_dir)
    ingest.run_available_now(
        ingest.streaming_histogram_1m(
            ingest.stream_points(spark, in_dir), LO, HI, NB),
        out_dir, ckpt)
    got = spark.read.parquet(out_dir)

    want = R3.histogram_rollup(mk_points(0, 500), "1m", LO, HI, NB,
                               series_cols=["doc_id", "source"])
    assert got.count() == want.count() > 0
    key = lambda r: (r.doc_id, r.bucket_ts, r.bin)  # noqa: E731
    assert {key(r): r.cnt for r in got.collect()} == \
           {key(r): r.cnt for r in want.collect()}
    # batch tier-up + quantile serving compose on the STREAMED state
    h_stream = R3.histogram_tier_up(got, "1h",
                                    series_cols=["doc_id", "source"])
    q_stream = R3.histogram_quantiles(
        h_stream, [0.5], LO, HI, NB, series_cols=["doc_id", "source"])
    h_direct = R3.histogram_rollup(mk_points(0, 500), "1h", LO, HI, NB,
                                   series_cols=["doc_id", "source"])
    q_direct = R3.histogram_quantiles(
        h_direct, [0.5], LO, HI, NB, series_cols=["doc_id", "source"])
    qs = {(r.doc_id, r.bucket_ts): r.quantile for r in q_stream.collect()}
    qd = {(r.doc_id, r.bucket_ts): r.quantile for r in q_direct.collect()}
    assert qs == qd and len(qs) > 0


def test_incremental_tier_fold_matches_batch_and_is_idempotent(
        spark, tmp_path):
    """Three out-of-order micro-batches folded through the mergeable
    tier table equal the batch rollup over all points bit-for-bit —
    INCLUDING a batch that lands entirely inside already-finalized
    buckets (arbitrary lateness, the case the watermarked tiers
    cannot absorb).  Replaying a batch_id is a no-op (at-least-once
    foreachBatch made exactly-once)."""
    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    os.makedirs(tbl)

    def mk_points(lo, hi, ts_off=0):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("src_00").alias("source"),
            F.timestamp_seconds(
                1704067200 + ts_off + F.col("id") * 7).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )

    # batch 1: base window; batch 2: ~1h later; batch 3: LATE data
    # back inside batch 1's minute buckets (ts collisions impossible:
    # ids disjoint, step 7s, offset 3)
    parts = [mk_points(0, 300), mk_points(600, 900),
             mk_points(300, 600, ts_off=3)]
    for p in parts:
        p.write.mode("append").parquet(in_dir)
        ingest.run_tier_maintenance(
            ingest.stream_points(spark, in_dir), tbl, ckpt)

    got = R.finalize_state(
        ingest.read_tier_snapshot(spark, tbl)).toPandas()
    allpts = parts[0].unionByName(parts[1]).unionByName(parts[2])
    want = R.rollup_points(allpts, "1m").toPandas()
    keys = ["doc_id", "source", "bucket_ts"]
    for df in (got, want):
        df.sort_values(keys, inplace=True, ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in want.columns:
        assert (got[c] == want[c]).all(), c

    # idempotent replay: re-applying the LAST batch_id changes nothing
    import json

    import pytest as _pytest

    with open(f"{tbl}/_LATEST") as f:
        before = json.load(f)
    fold = ingest.incremental_tier_fold(spark, tbl)
    fold(parts[2], before["batch_id"])  # same id → skipped
    with open(f"{tbl}/_LATEST") as f:
        assert json.load(f) == before
    # a batch_id going BACKWARDS means the checkpoint lineage restarted
    # and the source will redeliver everything — folding would
    # double-count, so the fold refuses loudly
    with _pytest.raises(RuntimeError, match="lineage restarted"):
        fold(parts[0], before["batch_id"] - 1)
    with open(f"{tbl}/_LATEST") as f:
        assert json.load(f) == before


def test_incremental_fold_writes_only_touched_partitions(spark, tmp_path):
    """A late batch naming a single series rewrites ONLY that series'
    hash partition; every other partition is carried into the new
    version as HARDLINKS of the previous version's files (same inode,
    no data copy) — the file-level behavior of an Iceberg MERGE.  The
    final table still equals the batch rollup."""
    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    os.makedirs(tbl)

    def mk(lo, hi, only_doc=None):
        df = spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("s0").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )
        return df.where(F.col("doc_id") == only_doc) if only_doc else df

    # the three series must land in distinct hash partitions for the
    # assertion to bite (deterministic hash — pinned here)
    pbs = {r.doc_id: r.pb for r in spark.createDataFrame(
        [("d0",), ("d1",), ("d2",)], "doc_id string").select(
        "doc_id", F.pmod(F.xxhash64(
            F.col("doc_id").cast("string"), F.lit("s0")), F.lit(16))
        .alias("pb")).collect()}
    assert len(set(pbs.values())) == 3

    mk(0, 300).write.mode("append").parquet(in_dir)
    ingest.run_tier_maintenance(
        ingest.stream_points(spark, in_dir), tbl, ckpt)
    # late batch: ONLY doc d0's points
    mk(300, 600, only_doc="d0").write.mode("append").parquet(in_dir)
    ingest.run_tier_maintenance(
        ingest.stream_points(spark, in_dir), tbl, ckpt)

    import json

    with open(f"{tbl}/_LATEST") as f:
        v1 = json.load(f)["version"]
    v0 = sorted(d for d in os.listdir(tbl) if d.startswith("v"))[0]
    assert v0 != v1

    def inodes(version, pb):
        d = os.path.join(tbl, version, f"_pb={pb}")
        return {os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if os.path.isfile(os.path.join(d, f))}

    # untouched series' partitions: identical inodes (hardlinked)
    for doc in ("d1", "d2"):
        assert inodes(v0, pbs[doc]) == inodes(v1, pbs[doc]), doc
    # the touched partition was rewritten: disjoint inodes
    assert not (inodes(v0, pbs["d0"]) & inodes(v1, pbs["d0"]))

    got = R.finalize_state(
        ingest.read_tier_snapshot(spark, tbl)).toPandas()
    want = R.rollup_points(
        mk(0, 300).unionByName(mk(300, 600, only_doc="d0")),
        "1m").toPandas()
    keys = ["doc_id", "source", "bucket_ts"]
    for df in (got, want):
        df.sort_values(keys, inplace=True, ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in want.columns:
        assert (got[c] == want[c]).all(), c


def test_incremental_fold_layout_guard(spark, tmp_path):
    """Re-folding with a different n_parts (or an old-format pointer
    missing the layout) re-buckets series and would double-count — the
    fold refuses loudly instead."""
    import json

    import pytest as _pytest

    in_dir = str(tmp_path / "in")
    tbl = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    os.makedirs(tbl)
    pts = spark.range(0, 60).select(
        F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
        F.lit("s0").alias("source"),
        F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
        (F.col("id") % 10).cast("double").alias("value"))
    pts.write.mode("append").parquet(in_dir)
    ingest.run_tier_maintenance(
        ingest.stream_points(spark, in_dir), tbl, ckpt, n_parts=16)
    with open(f"{tbl}/_LATEST") as f:
        before = json.load(f)
    assert before["n_parts"] == 16
    bad = ingest.incremental_tier_fold(spark, tbl, n_parts=8)
    with _pytest.raises(RuntimeError, match="layout mismatch"):
        bad(pts, before["batch_id"] + 1)
    # an empty batch never burns a version or moves the pointer
    ok = ingest.incremental_tier_fold(spark, tbl, n_parts=16)
    ok(pts.where("value > 1e9"), before["batch_id"] + 1)
    with open(f"{tbl}/_LATEST") as f:
        assert json.load(f) == before


def test_streaming_threshold_alerts_matches_batch(spark, tmp_path):
    """Out-of-order delivery across micro-batches: the stateful
    operator buffers per-series events, finalizes the prefix behind
    the watermark in (ts, event_id) order, and the emitted transition
    stream equals the batch hysteresis operator exactly (once a
    sentinel advances the watermark past all real data)."""
    import numpy as np
    import pandas as pd

    from ts2g2_spark.operators.metrics import threshold_alerts

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    rng = np.random.default_rng(23)
    n = 600
    base = 1704067200
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 3000, n), unit="s"),
        "user_id": rng.integers(0, 4, n).astype(np.int64),
        "event_type": "t",
        "value": rng.normal(70, 25, n).round(1),
        "props": "",
    })
    # three shuffled slices -> heavy cross-batch reordering (all within
    # the 1h watermark), then a far-future sentinel to flush
    order = rng.permutation(n)
    slices = np.array_split(order, 3)
    batches = [pdf.iloc[ix] for ix in slices]
    # watermark advances AFTER the batch that carries the new max event
    # time, so flushing needs two sentinel drains: the first moves the
    # watermark past all real data, the second's processing finalizes it
    def sentinel(eid, t_off):
        return pd.DataFrame({
            "event_id": [eid], "ts": pd.to_datetime([base + t_off],
                                                    unit="s"),
            "user_id": [999], "event_type": ["t"], "value": [0.0],
            "props": [""],
        })
    for b in [*batches, sentinel(10**6, 10**6),
              sentinel(10**6 + 1, 10**6 + 7200)]:
        spark.createDataFrame(b).write.mode("append").parquet(in_dir)
        ingest.run_available_now(
            ingest.streaming_threshold_alerts(
                ingest.stream_events(spark, in_dir), upper=90.0,
                lower=55.0),
            out_dir, ckpt)

    got = spark.read.parquet(out_dir).where("user_id != 999").toPandas()
    want = threshold_alerts(
        spark.createDataFrame(pdf), upper=90.0, lower=55.0,
        order_col="event_id").toPandas()
    keys = ["user_id", "ts"]
    for df in (got, want):
        df.sort_values(keys, inplace=True, ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in ("user_id", "ts", "value", "event"):
        assert (got[c] == want[c]).all(), c
    with pytest.raises(ValueError, match="lower <= upper"):
        ingest.streaming_threshold_alerts(
            ingest.stream_events(spark, in_dir), upper=1.0, lower=2.0)


def test_incremental_fold_crash_window_redelivery(spark, tmp_path,
                                                  monkeypatch):
    """Crash-window property (VERDICT r4 #6): a failure injected inside
    the fold's commit window — (a) after the version-dir write + the
    hardlink carry but before the atomic `_LATEST` replace, and (b)
    MID-hardlink-carry (partial dir WITH carried links) — leaves the
    table readable at the previous snapshot, and redelivering the same
    batch converges to exactly the no-crash result (values and pointer
    state), exercising the rmtree partial-dir path both with and
    without carried hardlinks."""
    import json
    import shutil

    def mk(lo, hi, only_doc=None):
        df = spark.range(lo, hi).select(
            F.concat(F.lit("d"), (F.col("id") % 3)).alias("doc_id"),
            F.lit("s0").alias("source"),
            F.timestamp_seconds(1704067200 + F.col("id") * 7).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )
        return df.where(F.col("doc_id") == only_doc) if only_doc else df

    batches = [(0, mk(0, 300)), (1, mk(300, 600, only_doc="d0")),
               (2, mk(600, 900, only_doc="d1"))]

    # control table: no crashes
    ctl = str(tmp_path / "control")
    os.makedirs(ctl)
    fold_ctl = ingest.incremental_tier_fold(spark, ctl)
    for bid, df in batches:
        fold_ctl(df, bid)
    want = R.finalize_state(
        ingest.read_tier_snapshot(spark, ctl)).toPandas()
    with open(f"{ctl}/_LATEST") as f:
        want_ptr = json.load(f)

    def run_with_crash(name, crash_fn):
        tbl = str(tmp_path / name)
        os.makedirs(tbl)
        fold = ingest.incremental_tier_fold(spark, tbl)
        fold(batches[0][1], 0)
        fold(batches[1][1], 1)
        with open(f"{tbl}/_LATEST") as f:
            before = json.load(f)
        with pytest.raises(RuntimeError, match="injected"):
            crash_fn(fold)
        # crash left the table readable at the PREVIOUS snapshot
        with open(f"{tbl}/_LATEST") as f:
            assert json.load(f) == before
        # redelivery of the same batch converges
        fold(batches[2][1], 2)
        got = R.finalize_state(
            ingest.read_tier_snapshot(spark, tbl)).toPandas()
        keys = ["doc_id", "source", "bucket_ts"]
        for df in (got,):
            df.sort_values(keys, inplace=True, ignore_index=True)
        w = want.sort_values(keys, ignore_index=True)
        assert len(got) == len(w) and len(got) > 0
        for c in w.columns:
            assert (got[c] == w[c]).all(), (name, c)
        with open(f"{tbl}/_LATEST") as f:
            assert json.load(f) == want_ptr
        return tbl

    # (a) crash between full write (incl. hardlink carry) and commit
    real_replace = os.replace

    def crash_commit(fold):
        def boom(src_p, dst_p):
            if os.path.basename(dst_p) == "_LATEST":
                raise RuntimeError("injected commit crash")
            return real_replace(src_p, dst_p)
        monkeypatch.setattr(os, "replace", boom)
        try:
            fold(batches[2][1], 2)
        finally:
            monkeypatch.setattr(os, "replace", real_replace)

    tbl_a = run_with_crash("crash_commit", crash_commit)
    # partial v2 existed at crash time WITH carried hardlinks; after
    # redelivery the version is complete and GC kept the live pair
    assert os.path.isdir(os.path.join(tbl_a, "v2"))

    # (b) crash MID-hardlink-carry: partial version dir with some
    # carried links already present — redelivery must rmtree it first
    real_link = os.link

    def crash_carry(fold):
        calls = {"n": 0}

        def boom(src_p, dst_p):
            calls["n"] += 1
            if calls["n"] > 1:
                raise RuntimeError("injected carry crash")
            return real_link(src_p, dst_p)
        monkeypatch.setattr(os, "link", boom)
        try:
            fold(batches[2][1], 2)
        finally:
            monkeypatch.setattr(os, "link", real_link)
        assert calls["n"] > 1  # the crash actually hit mid-carry

    run_with_crash("crash_carry", crash_carry)

    # (c) pre-existing junk partial version dir (crash mid parquet
    # write, nothing committed): the fold clears and rewrites it
    tbl = str(tmp_path / "crash_junk")
    os.makedirs(tbl)
    fold = ingest.incremental_tier_fold(spark, tbl)
    fold(batches[0][1], 0)
    fold(batches[1][1], 1)
    junk = os.path.join(tbl, "v2", "_pb=0")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    fold(batches[2][1], 2)
    got = R.finalize_state(
        ingest.read_tier_snapshot(spark, tbl)).toPandas()
    keys = ["doc_id", "source", "bucket_ts"]
    got.sort_values(keys, inplace=True, ignore_index=True)
    w = want.sort_values(keys, ignore_index=True)
    for c in w.columns:
        assert (got[c] == w[c]).all(), c
    assert not os.path.exists(os.path.join(tbl, "v2", "_pb=0",
                                           "part-junk.parquet"))
    shutil.rmtree(str(tmp_path / "control"), ignore_errors=True)


def test_streaming_hll_converges_to_batch(spark, tmp_path):
    """streaming_hll_distinct: update-mode running estimate; after each
    drain the LATEST row per group equals the batch hll_distinct over
    all rows streamed so far — bit-exact, including across a
    checkpoint-resumed second drain."""
    from ts2g2_spark.operators import sketches

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk_events(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(1704067200 + F.col("id")).alias("ts"),
            (F.col("id") % 37).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3)).alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    emitted: list[tuple[int, list]] = []

    def drain():
        q = (
            ingest.streaming_hll_distinct(
                ingest.stream_events(spark, in_dir, max_files=1))
            .writeStream
            .foreachBatch(lambda df, bid: emitted.append(
                (bid, df.collect())))
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def latest_per_group():
        last = {}
        for bid, rows in sorted(emitted, key=lambda t: t[0]):
            for r in rows:
                last[r.event_type] = r
        return last

    mk_events(0, 400).write.mode("append").parquet(in_dir)
    drain()
    got1 = latest_per_group()
    want1 = {r.event_type: r for r in sketches.hll_distinct(
        mk_events(0, 400), "user_id", ("event_type",)).collect()}
    assert {k: (v.n_occupied, v.sum_units, v.est_distinct)
            for k, v in got1.items()} == \
           {k: (v.n_occupied, v.sum_units, v.est_distinct)
            for k, v in want1.items()}

    # second drain resumes the register state from the checkpoint;
    # new users (id % 53 shifts the residues) must fold into it
    mk_events(4000, 4600).select(
        "event_id", "ts", (F.col("event_id") % 53).alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("append").parquet(in_dir)
    drain()
    union = mk_events(0, 400).unionByName(
        mk_events(4000, 4600).select(
            "event_id", "ts", (F.col("event_id") % 53).alias("user_id"),
            "event_type", "value", "props"))
    want2 = {r.event_type: r for r in sketches.hll_distinct(
        union, "user_id", ("event_type",)).collect()}
    got2 = latest_per_group()
    assert {k: (v.n_occupied, v.sum_units, v.est_distinct)
            for k, v in got2.items()} == \
           {k: (v.n_occupied, v.sum_units, v.est_distinct)
            for k, v in want2.items()}
    # the running estimate grew (more distincts streamed)
    assert all(got2[k].n_occupied >= got1[k].n_occupied for k in got1)


def test_streaming_hdr_converges_to_batch(spark, tmp_path):
    """streaming_hdr_quantiles: update-mode running quantiles; after
    each drain the LATEST rows per group equal the batch
    hdr_quantiles(hdr_sketch(...)) over all rows streamed so far —
    integer-exact, including across a checkpoint-resumed second
    drain."""
    from ts2g2_spark.operators import sketches

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def mk_events(lo, hi, scale=37):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(1704067200 + F.col("id")).alias("ts"),
            (F.col("id") % 7).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3)).alias("event_type"),
            ((F.col("id") * scale) % 9001).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )

    emitted: list[tuple[int, list]] = []

    def drain():
        q = (
            ingest.streaming_hdr_quantiles(
                ingest.stream_events(spark, in_dir, max_files=1),
                "CAST(value AS BIGINT)", qs=(0.5, 0.99))
            .writeStream
            .foreachBatch(lambda df, bid: emitted.append(
                (bid, df.collect())))
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def latest_per_key():
        last = {}
        for bid, rows in sorted(emitted, key=lambda t: t[0]):
            for r in rows:
                last[(r.event_type, r.q)] = (
                    r.n_total, r.rank, r.q_lo, r.q_hi)
        return last

    def batch(df):
        sk = sketches.hdr_sketch(df, "CAST(value AS BIGINT)",
                                 group_cols=("event_type",))
        return {(r.event_type, r.q): (r.n_total, r.rank, r.q_lo, r.q_hi)
                for r in sketches.hdr_quantiles(
                    sk, (0.5, 0.99),
                    group_cols=("event_type",)).collect()}

    mk_events(0, 400).write.mode("append").parquet(in_dir)
    drain()
    assert latest_per_key() == batch(mk_events(0, 400))

    # second drain resumes bucket state from the checkpoint; a new
    # value scale shifts the distribution upward
    mk_events(4000, 4500, scale=91).write.mode("append").parquet(in_dir)
    drain()
    union = mk_events(0, 400).unionByName(mk_events(4000, 4500,
                                                    scale=91))
    got2 = latest_per_key()
    assert got2 == batch(union)
    # n_total grew by exactly the second batch's rows (900 / 3 groups)
    assert all(got2[k][0] == 300 for k in got2)


def test_streaming_hdr_validation(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    stream = ingest.stream_events(spark, in_dir, max_files=1)
    with pytest.raises(ValueError, match="group_cols"):
        ingest.streaming_hdr_quantiles(stream, "value", group_cols=())
    with pytest.raises(ValueError, match="q must be"):
        ingest.streaming_hdr_quantiles(stream, "value", qs=(0.0,))
    with pytest.raises(ValueError, match="sub_bits"):
        ingest.streaming_hdr_quantiles(stream, "value", sub_bits=99)
