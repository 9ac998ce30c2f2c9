"""Temporal alignment operators (engine-native, SURVEY §2.7 family).

The classic timeseries-store primitive the rollup/gap-fill tiers still
lacked: the as-of join — align each left row with the latest right row at
or before its timestamp, per key.  Spark has no built-in as-of join; the
naive formulations are a range join (O(n·m) candidate explosion) or a
per-key collect.  Here it is the union + ordered-window formulation:

    union(left-tagged, right-tagged)
      -> window partitionBy(key) orderBy(ts, side)
      -> last(right payload, ignorenulls)
      -> keep left rows

One shuffle on the join key, no candidate pair blow-up, streaming-friendly
ordering — the plan a 1000-executor cluster wants.  Right rows sort before
left rows at equal timestamps, so the match is backward-INCLUSIVE
(right.ts <= left.ts), matching DuckDB/pandas `merge_asof` semantics.

`tolerance_s` bounds staleness: a match older than `left.ts - tolerance`
is nulled out (the row survives, left-join style), so a dead sensor stops
contributing features after the horizon instead of forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every `left` row with the payload columns of the latest
    `right` row having the same key and `right_ts <= left_ts` (within
    `tolerance_s` seconds if given), or nulls when no such row exists.
    Payload columns are right's non-key, non-ts columns; name collisions
    with left columns are suffixed `_r`.

    The right side must be unique per (key, right_ts) — rollup tiers are
    (the bucket is the grain).  With duplicates the latest-in-window row
    wins nondeterministically; callers needing determinism dedup first.
    """
    scols = list(key_cols)
    payload = [c for c in right.columns if c not in scols and c != right_ts]
    lcols = [c for c in left.columns if c not in scols and c != left_ts]

    def struct_ddl(fields: list[tuple[str, str]]) -> str:
        # backtick-quote EVERY field name (payload columns may carry
        # spaces/dashes); the _rts field is always present, so an empty
        # payload still yields a parseable one-field struct
        return ("struct<"
                + ",".join(f"`{n}`:{t}" for n, t in fields) + ">")

    rts_t = right.schema[right_ts].dataType.simpleString()
    r_ddl = struct_ddl(
        [("_rts", rts_t)]
        + [(c, right.schema[c].dataType.simpleString()) for c in payload])
    l_ddl = struct_ddl(
        [(c, left.schema[c].dataType.simpleString()) for c in lcols])

    l_tag = left.select(
        *scols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[left[c] for c in lcols]).alias("_l"),
        F.lit(None).cast(r_ddl).alias("_r"),
    )
    r_tag = right.select(
        *scols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_ddl).alias("_l"),
        F.struct(right[right_ts].alias("_rts"),
                 *[right[c] for c in payload]).alias("_r"),
    )

    w = (
        Window.partitionBy(*scols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ff = F.last("_r", ignorenulls=True).over(w)
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_m", ff)
        .where(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_m._rts") >= F.col("_ts")
                - F.expr(f"interval {int(tolerance_s)} second"),
                F.col("_m"),
            ),
        )

    # getField (not dotted strings) so odd payload names resolve; suffix
    # _r repeatedly until the name is free of BOTH left columns and
    # previously assigned output names (left may already own `<c>_r`)
    out_l = [F.col("_l").getField(c).alias(c) for c in lcols]
    used = set(scols) | {left_ts} | set(lcols)
    out_r = []
    for c in payload:
        name = c
        while name in used:
            name += "_r"
        used.add(name)
        out_r.append(F.col("_m").getField(c).alias(name))
    return matched.select(
        *scols, F.col("_ts").alias(left_ts), *out_l, *out_r
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_start: str = "start_ts",
    left_end: str = "end_ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval overlap join: emit one row per (left, right) pair with
    the same key whose CLOSED intervals overlap
    (left.start <= right.end AND right.start <= left.end).

    Spark would execute the naive inequality-join formulation as a
    per-key cross product (BroadcastNestedLoopJoin / cartesian at
    scale).  Here both sides explode onto a `bucket_s`-second time grid
    and EQUI-join on (key, bucket) — candidates are only pairs sharing a
    grid cell.  Each overlapping pair is kept in exactly ONE cell — the
    cell containing the overlap's start, max(l.start, r.start) — so no
    distinct/dedup shuffle is needed afterwards.

    Pick `bucket_s` near the typical interval length: the explode
    fan-out is O(interval_len / bucket_s) rows per input row, and the
    per-cell candidate count is what bounds join work.  Intervals with
    end < start raise at execution (raise_error rides the bucket
    expression, un-prunable).

    Output: key cols + left's other columns (as-is) + right's other
    columns (suffixed `_r` until free of collisions).  Timestamps
    compare in epoch microseconds (cast through TIMESTAMP under the
    pinned-UTC session).

    Scale shape: two narrow exchanges on (key, bucket) feeding one
    equi-join; the overlap filter and the owner-cell predicate are
    cheap per-candidate codegen.  Long intervals fan out linearly in
    grid cells — bound them upstream (e.g. retention-clip sessions)
    or raise bucket_s.
    """
    if bucket_s <= 0:
        raise ValueError(
            f"interval_join: bucket_s must be positive, got {bucket_s}")
    bus = int(bucket_s) * 1_000_000

    # internal staging names are made fresh against BOTH inputs so a
    # caller payload named `_b`/`_ls`/... is never overwritten/shadowed
    taken = set(left.columns) | set(right.columns) | set(key_cols)

    def fresh(base):
        name = base
        while name in taken:
            name += "_"
        taken.add(name)
        return name

    B, LS, LE, RS, RE = (fresh(n) for n in ("_b", "_ls", "_le",
                                            "_rs", "_re"))

    def tag(df, start, end, side, s_name, e_name):
        s_us = F.unix_micros(F.col(start).cast("timestamp"))
        e_us = F.unix_micros(F.col(end).cast("timestamp"))
        seq = F.when(
            e_us >= s_us,
            F.sequence(F.floor(s_us / bus), F.floor(e_us / bus)),
        ).otherwise(F.raise_error(F.lit(
            f"interval_join: {side} interval with end < start "
            f"({end} < {start})")))
        return df.withColumn(s_name, s_us).withColumn(e_name, e_us) \
                 .withColumn(B, F.explode(seq))

    lcols = [c for c in left.columns if c not in key_cols]
    rcols = [c for c in right.columns if c not in key_cols]
    l_tag = tag(left, left_start, left_end, "left", LS, LE).select(
        *key_cols, B, LS, LE, *lcols)
    used = set(key_cols) | set(lcols) | {B, LS, LE, RS, RE}
    r_out, r_sel = [], []
    for c in rcols:
        name = c
        while name in used:
            name += "_r"
        used.add(name)
        r_out.append(name)
        r_sel.append(F.col(c).alias(name))
    r_tag = tag(right, right_start, right_end, "right", RS, RE).select(
        *key_cols, B, RS, RE, *r_sel)

    joined = l_tag.join(r_tag, [*key_cols, B])
    overlap = (F.col(LS) <= F.col(RE)) & (F.col(RS) <= F.col(LE))
    owner = F.col(B) == F.floor(F.greatest(F.col(LS), F.col(RS)) / bus)
    return joined.where(overlap & owner).select(*key_cols, *lcols, *r_out)


def state_durations(
    points: DataFrame,
    state_col: str | None = None,
    low: float | None = None,
    high: float | None = None,
    series_cols: list[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Duration-in-state aggregation (the TimescaleDB-toolkit
    `state_agg`/`compact_state_agg` analog): label each observation with
    a state, merge consecutive same-state observations into intervals
    (gaps-and-islands), and report per series x state the interval
    count, total and longest dwell time, and first entry.

    States come from `state_col` if given, else from (low, high)
    thresholds on `val_col`: value < low -> 'low', value >= high ->
    'high', else 'mid'.  A state holds from its point's timestamp until
    the NEXT observation's timestamp (step-function semantics, like
    state_agg); the last observation of a series contributes zero dwell
    — there is no evidence past it.

    DETERMINISM CONTRACT: all arithmetic is integer microseconds
    (unix_micros) — no floats anywhere, so a SQL oracle replaying the
    same lag/lead/running-sum windows matches hash-exactly.  Within-
    series ordering is (ts, order_col); pass `order_col` (e.g. an event
    id) when one series can carry duplicate timestamps, otherwise the
    island boundaries are tie-ambiguous in ANY engine.

    Output: series cols + state, n_intervals, total_us, longest_us,
    first_enter (timestamp of the first transition into the state).

    Scale shape: ONE shuffle on the series key feeds both ordered
    windows (lead + running sum share the partitioning), then two
    partial-agg'd hash aggregations (series x island, series x state)
    reuse the same hash-partitioning — no further exchange of the big
    side.  State is O(1) per window frame; nothing is collected.
    """
    if state_col is None and (low is None or high is None):
        raise ValueError(
            "state_durations: pass state_col or both low and high")
    scols = [F.col(c) for c in series_cols]
    order = [F.col("_us")] + (
        [F.col(order_col)] if order_col is not None else [])
    w = Window.partitionBy(*scols).orderBy(*order)
    if state_col is not None:
        state = F.col(state_col)
    else:
        v = F.col(val_col)
        state = (F.when(v < F.lit(float(low)), F.lit("low"))
                 .when(v >= F.lit(float(high)), F.lit("high"))
                 .otherwise(F.lit("mid")))
    staged = points.select(
        *scols,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        *([F.col(order_col)] if order_col is not None else []),
        state.alias("_state"))
    marked = staged.select(
        *scols, "_us", "_state",
        *([F.col(order_col)] if order_col is not None else []),
        F.coalesce(F.lead("_us", 1).over(w), F.col("_us")).alias("_nxt"),
        F.when(F.lag("_state", 1).over(w).isNull()
               | (F.lag("_state", 1).over(w) != F.col("_state")),
               F.lit(1)).otherwise(F.lit(0)).alias("_chg"))
    # explicit ROWS frame: the default RANGE frame would merge peer rows
    # at duplicate timestamps into one running-sum value
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = marked.select(
        *scols, "_us", "_state", "_nxt",
        F.sum("_chg").over(wrows).alias("_seg"))
    segs = islands.groupBy(*scols, "_seg").agg(
        F.first("_state").alias("state"),
        F.min("_us").alias("_enter_us"),
        (F.max("_nxt") - F.min("_us")).alias("_dur_us"))
    return segs.groupBy(*scols, "state").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("_dur_us").alias("total_us"),
        F.max("_dur_us").alias("longest_us"),
        # cast back to NTZ: inputs are parquet TIMESTAMP_NTZ, and under
        # the pinned-UTC session contract the wall-clock is the instant
        F.timestamp_micros(F.min("_enter_us")).cast("timestamp_ntz")
        .alias("first_enter"))
