"""ts -> graph operators as Spark DataFrame transforms.

Data contract — the "series frame": (series_key string, values
array<double>).  A series is row-local (one row = one whole series or one
segment), so every kernel below is a mapInPandas over Arrow batches with
ZERO shuffle: edges come out as rows keyed by series_key.  Adjacency is
data, never a driver-side object (SURVEY §1.2).

Two physical strategies for OPG/QG:
  * kernel (default): row-local numpy, map-only — the 100 TB path.
  * relational: lead()-window + hash-aggregate over a row-per-point table —
    used when points arrive as rows and for SQL-oracle cross-checks; the
    shuffle carries one row per (series, bucket-pattern), partial-agg'd.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ts2g2_spark.operators import kernels

EDGE_SCHEMA = "series_key string, src long, dst long, weight double"
PAT_EDGE_SCHEMA = (
    "series_key string, src_pattern string, dst_pattern string, weight double"
)


# ----------------------------------------------------------------- inputs
def series_from_tokens(df: DataFrame) -> DataFrame:
    """tokenized input table -> series frame (values = double(tokens))."""
    return df.select(
        F.col("doc_id").alias("series_key"),
        F.expr("transform(tokens, t -> cast(t as double))").alias("values"),
    )


def series_from_points(
    points: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Row-per-point table -> series frame.  Deterministic point order by
    (ts, order_col).  One shuffle (groupBy key), then everything downstream
    is map-only."""
    okey = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    packed = F.array_sort(
        F.collect_list(F.struct(*okey, F.col(val_col).alias("v")))
    )
    return points.groupBy(
        F.col(key_col).cast("string").alias("series_key")
    ).agg(F.transform(packed, lambda s: s["v"]).alias("values"))


# ------------------------------------------------- preprocessing (P2/P3)
def segment(df: DataFrame, start: int, end: int) -> DataFrame:
    """Positional slice ts[start:end] (ref core/model.py:58-60). Catalyst
    slice(), no UDF."""
    return df.withColumn(
        "values", F.expr(f"slice(values, {start + 1}, {max(end - start, 0)})")
    )


def sliding_windows(
    df: DataFrame, win_size: int, move_len: int = 1
) -> DataFrame:
    """Sliding-window segmentation preserving the reference off-by-one
    (core/model.py:81-82: range(0, len-win, move) — the final window
    starting at len-win is DROPPED; len<=win -> no windows).

    Pure Catalyst: sequence() of starts + slice(); output one row per
    segment with seg_id = start index, series_key suffixed for downstream
    per-segment kernels."""
    return (
        df.where(F.size("values") > win_size)
        .select(
            "series_key",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(values) - {win_size} - 1,"
                    f" {move_len}),"
                    f" s -> slice(values, s + 1, {win_size}))"
                )
            ).alias("seg_id", "seg_values"),
        )
        .select(
            "series_key",
            (F.col("seg_id") * move_len).cast("long").alias("start_idx"),
            F.col("seg_values").alias("values"),
        )
    )


def histogram(df: DataFrame, bins: int) -> DataFrame:
    """np.histogram per series (ref core/model.py:225-233), exact."""
    schema = "series_key string, bin_edges array<double>, freqs array<long>"

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                f, b = np.histogram(np.asarray(r.values, np.float64), bins)
                rows.append({"series_key": r.series_key, "bin_edges": b,
                             "freqs": f})
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kern, schema=schema)


# --------------------------------------------------- visibility (G1-G5)
def visibility_edges(
    df: DataFrame,
    kind: str = "natural",
    limit: int = 0,
    angle: float | None = None,
    angle_abs: bool = True,
    weighted: bool = False,
    weight_abs: bool = True,
) -> DataFrame:
    """NVG/HVG (+angle constraint, +angle weighting) edge rows.
    Map-only; per-series cost O(n^2) worst-case vectorized (reference is
    O(n^3) Python: to_graph/strategies.py:527-540)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, srcs, dsts, ws = [], [], [], []
            for r in pdf.itertuples(index=False):
                y = np.asarray(r.values, np.float64)
                e, w = kernels.visibility_graph(
                    y, kind=kind, limit=limit, angle=angle,
                    angle_abs=angle_abs, weighted=weighted,
                    weight_abs=weight_abs)
                keys.append(np.repeat(r.series_key, len(e)))
                srcs.append(e[:, 0] if len(e) else np.empty(0, np.int64))
                dsts.append(e[:, 1] if len(e) else np.empty(0, np.int64))
                ws.append(w)
            if keys:
                yield pd.DataFrame({
                    "series_key": np.concatenate(keys),
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                    "weight": np.concatenate(ws),
                })

    return df.mapInPandas(kern, schema=EDGE_SCHEMA)


# ------------------------------------------- ordinal partition (G6/G7)
def _pat_str(arr: np.ndarray) -> list[str]:
    return [",".join(map(str, row)) for row in arr.tolist()]


def opg_edges(
    df: DataFrame, w: int, tau: int, use_quantiles: bool = False, Q: int = 4
) -> DataFrame:
    """Ordinal-partition transition edges per series (kernel path).
    Patterns serialized as comma-joined rank strings."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pats = kernels.ordinal_patterns(
                    np.asarray(r.values, np.float64), w, tau,
                    use_quantiles=use_quantiles, Q=Q)
                s, d, wt = kernels.opg_edges(pats)
                for ss, dd, ww in zip(_pat_str(s), _pat_str(d), wt.tolist()):
                    rows.append({"series_key": r.series_key,
                                 "src_pattern": ss, "dst_pattern": dd,
                                 "weight": ww})
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kern, schema=PAT_EDGE_SCHEMA)


def opg_edges_multivariate(df: DataFrame, w: int, tau: int) -> DataFrame:
    """Multivariate OPG (G7, ref to_graph/strategies.py:72-94,107-126):
    per-variable up/down diff patterns concatenated variable-major, then
    the same transition aggregate (weight = count / #patterns).  Input
    frame: (series_key, variables array<array<double>>) — all variables of
    one multivariate series row-local, so the kernel stays map-only."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                series = [np.asarray(v, np.float64) for v in r.variables]
                pats = kernels.multivariate_ordinal_patterns(series, w, tau)
                s, d, wt = kernels.opg_edges(pats)
                for ss, dd, ww in zip(_pat_str(s), _pat_str(d), wt.tolist()):
                    rows.append({"series_key": r.series_key,
                                 "src_pattern": ss, "dst_pattern": dd,
                                 "weight": ww})
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kern, schema=PAT_EDGE_SCHEMA)


def opg_edges_relational(
    points: DataFrame,
    key_col: str,
    w: int,
    tau: int,
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Catalyst-native OPG over a row-per-point table: lead() windows build
    the embedding vector, a vectorized pandas_udf ranks it (stable argsort,
    ref to_graph/strategies.py:64-70), then transitions are a partial+final
    hash aggregate and the weight denominator a broadcast-joined per-series
    count.  Shuffle: one exchange on key_col (window), one on
    (key, src, dst) (agg) — both partial-agg friendly."""
    @F.pandas_udf("string")
    def rank_pattern(v: pd.Series) -> pd.Series:
        out = []
        for arr in v:
            if arr is None or any(x is None for x in arr):
                out.append(None)
                continue
            a = np.asarray(arr, np.float64)
            order = np.argsort(a, kind="stable")
            ranks = np.empty(len(a), dtype=np.int64)
            ranks[order] = np.arange(len(a))
            out.append(",".join(map(str, ranks.tolist())))
        return pd.Series(out)

    okeys2 = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    kwin = Window.partitionBy(key_col).orderBy(*okeys2)
    # reference off-by-one (to_graph/strategies.py:54): the embedding loop
    # is range(n - w*tau + 1), which DROPS the last tau-1 windows that a
    # stride-tau slice could still fill — enforce pos <= n - w*tau + 1.
    ordered = points.select(
        F.col(key_col).cast("string").alias("series_key"),
        F.row_number().over(kwin).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("n"),
        F.array(*[F.lead(val_col, i * tau).over(kwin)
                  for i in range(w)]).alias("vec"),
    ).where(
        (~F.exists("vec", lambda x: x.isNull()))
        & (F.col("pos") <= F.col("n") - w * tau + 1)
    ).select("series_key", "pos", rank_pattern("vec").alias("pattern"))
    nxt = F.lead("pattern").over(
        Window.partitionBy("series_key").orderBy("pos"))
    trans = ordered.select("series_key", F.col("pattern").alias("src_pattern"),
                           nxt.alias("dst_pattern"))
    npat = ordered.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_patterns"))
    return (
        trans.where(F.col("dst_pattern").isNotNull())
        .groupBy("series_key", "src_pattern", "dst_pattern")
        .count()
        .join(F.broadcast(npat), "series_key")
        .select(
            "series_key", "src_pattern", "dst_pattern",
            (F.col("count") / F.col("n_patterns")).alias("weight"),
        )
    )


# ------------------------------------------------- quantile graph (G8/G9)
def qg_edges(df: DataFrame, Q: int, phi: int = 1) -> DataFrame:
    """Quantile-graph transition edges per series (kernel path)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                e, wt = kernels.qg_edges(
                    np.asarray(r.values, np.float64), Q, phi)
                for (s, d), ww in zip(e.tolist(), wt.tolist()):
                    rows.append({"series_key": r.series_key, "src": s,
                                 "dst": d, "weight": ww})
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kern, schema=EDGE_SCHEMA)


def qg_edges_relational(
    points: DataFrame,
    key_col: str,
    Q: int,
    phi: int = 1,
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Catalyst-native quantile graph over row-per-point tables.

    Exact per-series quantiles via percentile() window (linear
    interpolation — the same estimator as np.quantile, ref
    to_graph/strategies.py:409-411 incl. the bins[0] -= 1e-9 epsilon),
    digitize(right=True)-1 as size(filter(bins, b -> b < value)) - 1,
    transitions via lead(phi), per-source normalization via window sum.

    normalize=False returns the raw integer transition counts as `w`
    (long) instead of the per-source probability `weight` — the exact
    integer form generate.hash_walks needs for its modular weighted
    choice (integer arithmetic end to end, no float weight on the
    walk path)."""
    okeys = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    pwin = Window.partitionBy(key_col)
    qs = [i / Q for i in range(Q + 1)]
    bins = F.percentile(F.col(val_col), F.array(*[F.lit(q) for q in qs])).over(pwin)
    binned = points.select(
        F.col(key_col).cast("string").alias("series_key"),
        *okeys,
        F.col(val_col).alias("v"),
        bins.alias("bins0"),
    ).withColumn(
        "bins",
        F.concat(F.array(F.element_at("bins0", 1) - F.lit(1e-9)),
                 F.slice("bins0", 2, Q)),
    ).withColumn(
        "q",
        F.size(F.filter("bins", lambda b: b < F.col("v"))) - F.lit(1),
    )
    owin = Window.partitionBy("series_key").orderBy(*okeys)
    trans = binned.select(
        "series_key",
        F.col("q").alias("src"),
        F.lead("q", phi).over(owin).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counted = trans.groupBy("series_key", "src", "dst").count()
    if not normalize:
        return counted.select(
            "series_key", F.col("src").cast("long"),
            F.col("dst").cast("long"), F.col("count").alias("w"),
        )
    norm = Window.partitionBy("series_key", "src")
    return counted.select(
        "series_key", F.col("src").cast("long"), F.col("dst").cast("long"),
        (F.col("count") / F.sum("count").over(norm)).alias("weight"),
    )


# ------------------------------------------------- proximity (G11-G15)
def proximity_edges(
    df: DataFrame,
    method: str = "cycle",
    segment_length: int = 10,
    threshold: float = 0.5,
    k: int = 5,
    epsilon: float = 0.5,
    recurrence_type: str = "epsilon",
    tie_order: str = "reference",
) -> DataFrame:
    """Proximity networks (ref to_graph/strategies.py:175-397), map-only.

    tie_order applies to recurrence_type="k-nnn" only (see
    kernels.proximity_knn_edges): "reference" = argsort bit-parity,
    "stable" = deterministic (dist, index) ties, SQL-oracle-expressible.
    """
    if method in ("cycle", "correlation"):
        fn = lambda y: kernels.proximity_cycle_edges(  # noqa: E731
            y, segment_length, threshold)
    elif method == "recurrence":
        if recurrence_type == "epsilon":
            fn = lambda y: kernels.proximity_epsilon_edges(y, epsilon)  # noqa
        elif recurrence_type == "k-nnn":
            fn = lambda y: kernels.proximity_knn_edges(  # noqa: E731
                y, k, tie_order=tie_order)
        elif recurrence_type == "annn":
            fn = lambda y: kernels.proximity_annn_edges(y, k)  # noqa: E731
        else:
            raise ValueError(recurrence_type)
    else:
        raise ValueError(method)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, srcs, dsts, ws = [], [], [], []
            for r in pdf.itertuples(index=False):
                e, w = fn(np.asarray(r.values, np.float64))
                keys.append(np.repeat(r.series_key, len(e)))
                srcs.append(e[:, 0] if len(e) else np.empty(0, np.int64))
                dsts.append(e[:, 1] if len(e) else np.empty(0, np.int64))
                ws.append(w)
            if keys:
                yield pd.DataFrame({
                    "series_key": np.concatenate(keys),
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                    "weight": np.concatenate(ws),
                })

    return df.mapInPandas(kern, schema=EDGE_SCHEMA)
