"""Per-series summarization / downsampling operators (engine-native,
SURVEY §2.7 family): M4 visualization downsampling, parallel LTTB
downsampling, rolling z-score anomaly flags, and PAA/SAX symbolization.

All are pure Catalyst (no Python crossings) and shuffle on the series
key (M4: one partial-agg'd hash aggregate; z-score/SAX: one ordered
window; SAX adds a co-keyed segment aggregate; LTTB adds a bucket-keyed
join against a |series| x n_out aggregate) — the shapes a
1000-executor cluster wants for 10^12-point inputs.

SAX cites the reference's symbolization heritage: the quantile graph
(to_graph/strategies.py quantile strategy) bins values into per-series
quantiles; SAX is the classic fixed-breakpoint (N(0,1)) variant over
PAA-compressed segments, the standard primitive for indexing/motif
mining the reference stops short of.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# N(0,1) quantile breakpoints for alphabet sizes 3..6 (classic SAX,
# Lin et al. 2003).  Literal doubles so SQL oracles can embed the same
# constants digit-for-digit.
SAX_BREAKPOINTS = {
    3: (-0.4307272992954576, 0.4307272992954576),
    4: (-0.6744897501960817, 0.0, 0.6744897501960817),
    5: (-0.8416212335729142, -0.2533471031357997,
        0.2533471031357997, 0.8416212335729142),
    6: (-0.9674215661017014, -0.4307272992954576, 0.0,
        0.4307272992954576, 0.9674215661017014),
}


def _okey(ts_col: str, order_col: str | None) -> Column:
    """Deterministic per-point order key: (ts, order_col) struct when a
    tiebreak column exists, else the raw timestamp (callers with exact
    duplicate timestamps per series MUST pass order_col for reproducible
    first/last/tie picks)."""
    return (F.struct(F.col(ts_col), F.col(order_col)) if order_col
            else F.col(ts_col))


def m4_downsample(
    points: DataFrame,
    tier_s: int,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, bucket)
    keep the four points a pixel-perfect line plot needs — first, last,
    min, and max — as one row of (value, ts) pairs plus the point count.

    Ties: min is the earliest point carrying the minimum value, max the
    earliest carrying the maximum ("earliest" by the order key).

    Scale shape: a single partial-aggregated hash aggregate — the
    exchange carries one row per (series, bucket), never per point, and
    min_by/max_by combine associatively map-side.  This is the
    visualization-query twin of the rollup tiers (plans/rollup.py): same
    grain, but preserving actual points instead of moments.
    """
    okey = _okey(ts_col, order_col)
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / tier_s).cast("long") * tier_s
    ).alias("bucket_ts")
    val, ts = F.col(val_col), F.col(ts_col)
    # composite min_by keys are slower than plain-column keys in codegen
    # hash agg (measured ~4x on struct keys) but required here: the
    # argmin must tie-break on the order key to stay deterministic.
    # The max key negates the NUMERIC order components so max_by picks
    # the maximum value breaking ties toward the EARLIEST point.
    # cast through TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ (the
    # parquet events schema); the session tz is pinned UTC so the cast
    # is deterministic and lossless.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    neg_okey = (F.struct(-ts_us, -F.col(order_col)) if order_col
                else -ts_us)
    min_key = F.struct(val, okey)
    max_key = F.struct(val, neg_okey)
    return (
        points.groupBy(*[F.col(c) for c in series_cols], bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by(val, okey).alias("first_val"),
            F.min_by(ts, okey).alias("first_ts"),
            F.max_by(val, okey).alias("last_val"),
            F.max_by(ts, okey).alias("last_ts"),
            F.min(val).alias("min_val"),
            F.min_by(ts, min_key).alias("min_ts"),
            F.max(val).alias("max_val"),
            F.max_by(ts, max_key).alias("max_ts"),
        )
    )


def lttb_downsample(
    points: DataFrame,
    n_out: int,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    round_dp: int = 9,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    the PARALLEL variant: both triangle anchors are the neighbouring
    buckets' mean points instead of the previously-selected point, which
    removes the sequential dependency so every bucket selects
    independently — the form a partition-parallel engine wants.  (The
    sequential original feeds the left anchor forward; on smooth series
    the two pick near-identical points.)

    Semantics: the first and last point of each series are always kept
    (buckets 0 and n_out-1); interior points split into n_out-2
    equal-count buckets by position; each interior bucket keeps the
    point maximizing the triangle area against the previous and next
    buckets' (mean pos, mean value) anchors.  Series with <= n_out
    points are returned whole (bucket = pos).  The x axis is the 0-based
    position, not wall time (index-positional, like the reference's
    visibility kernels).

    Determinism: the comparison key is the area rounded to `round_dp`
    after a +1e-10 nudge (several ulps above cross-engine summation
    noise for |area| up to ~1e6, far below the 0.5e-9 grid — the
    seasonal_decompose rounding contract, rescaled), ties broken by the
    EARLIEST position.  Bucket assignment floors an IEEE double division
    — bit-identical in any engine.

    Output: series cols + bucket, pos, ts, value, area (NULL for the
    endpoint buckets and for kept-whole series).

    Scale shape: pos/count ride ONE ordered window on the series key;
    bucket means are a partial-agg'd refinement of that key
    (|series| x n_out rows); the anchors are a lag/lead window over that
    tiny aggregate; the join back is keyed on (series, bucket) and the
    final top-1 is a per-bucket window — no all-pairs anywhere, state
    per task O(points in its series).
    """
    if n_out < 3:
        raise ValueError(f"lttb_downsample: n_out must be >= 3, got {n_out}")
    scols = [F.col(c) for c in series_cols]
    wo = Window.partitionBy(*scols).orderBy(_okey(ts_col, order_col))
    wa = Window.partitionBy(*scols)
    # long pos: row_number is 32-bit, and (pos-1)*(n_out-2) would wrap
    # (ANSI: raise) past ~2^31/(n_out-2) points in one series
    pos = (F.row_number().over(wo) - 1).cast("long")
    n = F.count(F.lit(1)).over(wa)
    interior = 1 + F.floor(((pos - 1) * (n_out - 2)) / (n - 2))
    bucket = (
        F.when(n <= n_out, pos)
        .when(pos == 0, F.lit(0))
        .when(pos == n - 1, F.lit(n_out - 1))
        .otherwise(interior)
    ).cast("long")
    staged = points.select(
        *scols,
        pos.alias("pos"),
        F.col(ts_col),
        F.col(val_col).cast("double").alias("value"),
        bucket.alias("bucket"),
        (n <= n_out).alias("_keep_all"),
    )
    means = staged.groupBy(*series_cols, "bucket").agg(
        F.avg("pos").alias("_mx"), F.avg("value").alias("_my"))
    wb = Window.partitionBy(*scols).orderBy("bucket")
    anchors = means.select(
        *series_cols, "bucket",
        F.lag("_mx").over(wb).alias("_ax"),
        F.lag("_my").over(wb).alias("_ay"),
        F.lead("_mx").over(wb).alias("_cx"),
        F.lead("_my").over(wb).alias("_cy"),
    )
    joined = staged.join(anchors, [*series_cols, "bucket"])
    area2 = (
        (F.col("_ax") - F.col("_cx")) * (F.col("value") - F.col("_ay"))
        - (F.col("_ax") - F.col("pos")) * (F.col("_cy") - F.col("_ay"))
    )
    area = F.when(
        ~F.col("_keep_all")
        & F.col("_ax").isNotNull() & F.col("_cx").isNotNull(),
        F.round(F.abs(area2) / 2 + F.lit(1e-10), round_dp),
    )
    wpick = Window.partitionBy(*scols, "bucket").orderBy(
        F.col("_area").desc_nulls_last(), F.col("pos"))
    return (
        joined.withColumn("_area", area)
        .withColumn("_rn", F.row_number().over(wpick))
        .where(F.col("_rn") == 1)
        .select(*series_cols, "bucket", "pos", F.col(ts_col), "value",
                F.col("_area").alias("area"))
    )


def rolling_zscore(
    points: DataFrame,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    window: int = 20,
    min_points: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly flags: each point scored against the mean
    and sample standard deviation of its own series' PREVIOUS `window`
    points (never including itself — no self-masking).  Points with
    fewer than `min_points` predecessors or zero variance get z = NULL
    (is_anomaly = false), left-join style.

    Output: series cols + ts [+ order_col] + value, n_prior, z (rounded
    to 6 decimals — windowed moments are summation-order sensitive),
    is_anomaly.

    Scale shape: ONE exchange on the series key; the rolling frame is a
    bounded running window (O(window) state per series in the sort-based
    window operator), so memory per task is flat in series length.
    """
    scols = [F.col(c) for c in series_cols]
    w = (
        Window.partitionBy(*scols)
        .orderBy(_okey(ts_col, order_col))
        .rowsBetween(-window, -1)
    )
    mean = F.avg(val_col).over(w)
    sd = F.stddev_samp(val_col).over(w)
    n = F.count(val_col).over(w)
    z = F.when(
        (n >= min_points) & (sd > 0),
        F.round((F.col(val_col) - mean) / sd, 6),
    )
    keep = [*series_cols, ts_col]
    if order_col:
        keep.append(order_col)
    return points.select(
        *keep, F.col(val_col),
        n.alias("n_prior"),
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def sax_symbols(
    points: DataFrame,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    seg_len: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """PAA + SAX symbolization (Lin et al. 2003): z-normalize each
    series against its own mean/stddev, average consecutive `seg_len`
    points into PAA frames, and map each frame to a letter by the
    N(0,1) breakpoints for `alphabet` symbols (a = lowest band).  The
    trailing partial segment is kept with its own average.  Zero-variance
    series map every frame to the middle symbol (z treated as 0).

    Output: series cols + seg (0-based), n_pts, paa (rounded 6),
    symbol.

    Scale shape: the row_number and the per-series mean/std windows ride
    ONE exchange on the series key (same partitioning, unordered frame
    for the moments), then the PAA aggregate groups on (series, seg) —
    a strict refinement of the same key, partial-agg'd.
    """
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {set(SAX_BREAKPOINTS)}")
    scols = [F.col(c) for c in series_cols]
    wo = Window.partitionBy(*scols).orderBy(_okey(ts_col, order_col))
    wa = Window.partitionBy(*scols)
    rn = F.row_number().over(wo)
    mean = F.avg(val_col).over(wa)
    sd = F.stddev_samp(val_col).over(wa)
    z = F.when(sd > 0, (F.col(val_col) - mean) / sd).otherwise(F.lit(0.0))
    staged = points.select(
        *scols,
        ((rn - 1) / seg_len).cast("long").alias("seg"),
        z.alias("_z"),
    )
    paa = staged.groupBy(*series_cols, "seg").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.avg("_z").alias("_paa"),
    )
    bps = SAX_BREAKPOINTS[alphabet]
    sym = F.lit(chr(ord("a") + len(bps)))
    for i in range(len(bps) - 1, -1, -1):
        sym = F.when(F.col("_paa") < F.lit(bps[i]),
                     F.lit(chr(ord("a") + i))).otherwise(sym)
    return paa.select(
        *series_cols, "seg", "n_pts",
        F.round("_paa", 6).alias("paa"),
        sym.alias("symbol"),
    )


def sax_motifs(
    points: DataFrame,
    word_len: int = 4,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    seg_len: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """SAX motif mining (Lin et al. 2002 "Finding Motifs in Time
    Series"): slide a `word_len`-segment window over each series' SAX
    symbol string and count how often each word recurs — the classic
    discretized take on repeated-pattern discovery, and the symbolic
    cousin of the reference's ordinal-pattern transition counting
    (to_graph/strategies.py ordinal partition: patterns ARE the nodes,
    here words are the motifs).

    Output: series cols + word, n_occurrences, first_seg (the earliest
    0-based starting segment of the word) — one row per distinct
    (series, word); filter n_occurrences >= 2 for motifs proper.

    Scale shape: builds on sax_symbols' one exchange; the word is a
    lead-concat over the per-series SEGMENT rows (tiny — points/seg_len
    rows), and the motif count groups on (series, word), a refinement
    of the same key, partial-agg'd.  No joins.
    """
    if word_len < 2:
        raise ValueError(f"sax_motifs: word_len must be >= 2, got {word_len}")
    syms = sax_symbols(points, series_cols=series_cols, ts_col=ts_col,
                       val_col=val_col, order_col=order_col,
                       seg_len=seg_len, alphabet=alphabet)
    scols = [F.col(c) for c in series_cols]
    ws = Window.partitionBy(*scols).orderBy("seg")
    parts = [F.col("symbol")] + [
        F.lead("symbol", j).over(ws) for j in range(1, word_len)]
    word = F.concat(*parts)  # NULL when any lead runs off the end
    return (
        syms.select(*series_cols, F.col("seg"), word.alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy(*series_cols, "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.min("seg").alias("first_seg"))
    )
