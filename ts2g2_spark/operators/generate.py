"""Graph -> time-series generation as a Spark operator (SURVEY §2.5).

Per-series graphs arrive as edge/node frames (adjacency-as-data, §1.2);
`pack_graph_rows` folds them into one row per series (groupBy + sorted
collect), and `generate_sequences` walks each packed graph inside an Arrow
kernel with a DETERMINISTIC per-series seed derived from (run_seed,
series_key) — recorded in the output so lineage can replay any row
(SURVEY §4.3 "deterministic RNG for R-ops").

The walks themselves are embarrassingly parallel across series: one
mapInPandas stage, zero shuffle beyond the pack groupBy.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts2g2_spark.operators import genkernels as gk

PACKED_SCHEMA = (
    "series_key string, n long, node_values array<array<double>>, "
    "adj_src array<long>, adj_dst array<long>"
)
SEQ_SCHEMA = "series_key string, py_seed long, np_seed long, seq array<double>"


def pack_graph_rows(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(series_key, node_id, values[]) + (series_key, src, dst) -> one row
    per series with positional adjacency arrays.  Node ids must be the
    0..n-1 insertion positions (the engine's graph builders emit exactly
    that)."""
    nv = nodes.groupBy("series_key").agg(
        F.max("node_id").alias("max_id"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("node_id", "values"))),
            lambda s: s["values"],
        ).alias("node_values"),
    )
    ea = edges.groupBy("series_key").agg(
        F.array_sort(F.collect_list(F.struct("src", "dst"))).alias("e"))
    return (
        nv.join(ea, "series_key", "left")
        .select(
            "series_key",
            (F.col("max_id") + 1).alias("n"),
            "node_values",
            F.coalesce(F.transform("e", lambda s: s["src"]),
                       F.array().cast("array<long>")).alias("adj_src"),
            F.coalesce(F.transform("e", lambda s: s["dst"]),
                       F.array().cast("array<long>")).alias("adj_dst"),
        )
    )


def _seeds(run_seed: int, series_key: str) -> tuple[int, int]:
    """Stable per-series seed split (crc32 is stable across processes —
    NEVER hash(): PYTHONHASHSEED would break replay)."""
    base = zlib.crc32(f"{run_seed}:{series_key}".encode())
    return base & 0x7FFFFFFF, (base ^ 0x5DEECE66) & 0x7FFFFFFF


def _graph_from_row(row) -> gk.GraphData:
    n = int(row.n)
    neighbors: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(row.adj_src, row.adj_dst):
        s, d = int(s), int(d)
        neighbors[s].append(d)
        neighbors[d].append(s)  # undirected adjacency, insertion order
    values = [list(map(float, v)) for v in row.node_values]
    return gk.GraphData(values=values, neighbors=neighbors)


def generate_sequences(
    packed: DataFrame,
    ts_length: int,
    value_strategy: str = "random",
    node_strategy: str = "randomly",
    skip: int = 0,
    switch: int = 1,
    run_seed: int = 42,
) -> DataFrame:
    """Walk every packed per-series graph; returns the generated sequence
    plus the seeds used (lineage/replay contract)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                g = _graph_from_row(r)
                ps, ns = _seeds(run_seed, r.series_key)
                rng = gk.Rng.seeded(ps, ns)
                seq = gk.walk_plain([g], ts_length, value_strategy,
                                    node_strategy, rng, skip=skip,
                                    switch=switch)[0]
                rows.append({"series_key": r.series_key, "py_seed": ps,
                             "np_seed": ns,
                             "seq": np.asarray(seq, np.float64)})
            if rows:
                yield pd.DataFrame(rows)

    return packed.mapInPandas(kern, schema=SEQ_SCHEMA)


def generate_sliding_sequences(
    series: DataFrame,
    win_size: int,
    move_len: int = 1,
    ts_length: int = 30,
    value_strategy: str = "random_sliding",
    node_strategy: str = "randomly",
    skip: int = 0,
    switch: int = 1,
    run_seed: int = 42,
) -> DataFrame:
    """R3 sliding-window inversion from the series frame: each window is a
    supernode chained to its neighbors (ref core/model.py:504-573 walk over
    the sliding-window composed graph), carrying its window's per-point
    value lists for the *_sliding value strategies.  Preserves the
    reference windowing off-by-one (core/model.py:81-82: the final window
    starting at len-win is dropped; len <= win -> no windows -> the series
    emits no row)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                y = [float(v) for v in r.values]
                n = len(y)
                if n <= win_size:
                    continue
                starts = list(range(0, n - win_size, move_len))
                win_values = [[[y[s + t]] for t in range(win_size)]
                              for s in starts]
                m = len(starts)
                neighbors: list[list[int]] = [[] for _ in range(m)]
                for i in range(m - 1):
                    neighbors[i].append(i + 1)
                    neighbors[i + 1].append(i)
                g = gk.GraphData(values=[[] for _ in range(m)],
                                 neighbors=neighbors,
                                 win_values=win_values)
                ps, ns = _seeds(run_seed, r.series_key)
                rng = gk.Rng.seeded(ps, ns)
                seq = gk.walk_sliding([g], ts_length, value_strategy,
                                      node_strategy, rng, skip=skip,
                                      switch=switch)[0]
                rows.append({"series_key": r.series_key, "py_seed": ps,
                             "np_seed": ns,
                             "seq": np.asarray(seq, np.float64)})
            if rows:
                yield pd.DataFrame(rows)

    return series.mapInPandas(kern, schema=SEQ_SCHEMA)


def generate_quantile_sequences(
    series: DataFrame,
    Q: int,
    ts_length: int,
    value_strategy: str = "quantile_random",
    node_strategy: str = "randomly",
    skip: int = 0,
    switch: int = 1,
    run_seed: int = 42,
) -> DataFrame:
    """Quantile-graph inversion straight from the series frame
    (series_key, values): the kernel rebuilds the reference's quantile
    state (bins with the 1e-9 epsilon, recorded per-bin values —
    to_graph/strategies.py:407-435) and walks it, all row-local."""
    from ts2g2_spark.operators import kernels as K

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                y = np.asarray(r.values, np.float64)
                bins, idx = K.quantile_bins_indices(y, Q)
                q_values: list[list[float]] = [[] for _ in range(Q)]
                for i, b in enumerate(idx):
                    q_values[int(b)].append(float(y[i]))
                e, _ = K.qg_edges(y, Q)
                neighbors: list[list[int]] = [[] for _ in range(Q)]
                for s, d in e.tolist():
                    neighbors[s].append(d)
                g = gk.GraphData(values=[[] for _ in range(Q)],
                                 neighbors=neighbors,
                                 q_bins=bins.tolist(), q_values=q_values)
                ps, ns = _seeds(run_seed, r.series_key)
                rng = gk.Rng.seeded(ps, ns)
                seq = gk.walk_quantile([g], ts_length, value_strategy,
                                       node_strategy, rng, skip=skip,
                                       switch=switch)[0]
                rows.append({"series_key": r.series_key, "py_seed": ps,
                             "np_seed": ns,
                             "seq": np.asarray(seq, np.float64)})
            if rows:
                yield pd.DataFrame(rows)

    return series.mapInPandas(kern, schema=SEQ_SCHEMA)


def generate_ordinal_sequences(
    series: DataFrame,
    w: int,
    tau: int,
    hist_bins: int,
    ts_length: int,
    node_strategy: str = "randomly",
    skip: int = 0,
    switch: int = 1,
    run_seed: int = 42,
) -> DataFrame:
    """Ordinal-partition inversion from the series frame: rebuilds the OPG
    (patterns + transitions, to_graph/strategies.py:96-126) and the
    histogram state (core/model.py:225-233) row-locally, then walks
    (core/model.py:673-716)."""
    from ts2g2_spark.operators import kernels as K

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                y = np.asarray(r.values, np.float64)
                pats = K.ordinal_patterns(y, w, tau)
                uniq = list(dict.fromkeys(map(tuple, pats.tolist())))
                index = {p: i for i, p in enumerate(uniq)}
                neighbors: list[list[int]] = [[] for _ in range(len(uniq))]
                for a, b in zip(pats[:-1], pats[1:]):
                    ia, ib = index[tuple(a)], index[tuple(b)]
                    if ib not in neighbors[ia]:
                        neighbors[ia].append(ib)
                freqs, bins = np.histogram(y, bins=hist_bins)
                g = gk.GraphData(values=[[] for _ in uniq],
                                 neighbors=neighbors, patterns=uniq)
                ps, ns = _seeds(run_seed, r.series_key)
                rng = gk.Rng.seeded(ps, ns)
                seq = gk.walk_ordinal_partition(
                    [g], ts_length, node_strategy, rng,
                    freqs=[freqs.astype(np.float64)], bins=[bins],
                    w=w, tau=tau, skip=skip, switch=switch)[0]
                rows.append({"series_key": r.series_key, "py_seed": ps,
                             "np_seed": ns,
                             "seq": np.asarray(seq, np.float64)})
            if rows:
                yield pd.DataFrame(rows)

    return series.mapInPandas(kern, schema=SEQ_SCHEMA)


# ------------------------------------------- hash-replayable walks (R2/R7)
def hash_walks_fused(
    edges: DataFrame,
    n_walks: int = 8,
    n_steps: int = 16,
    run_seed: int = 42,
) -> DataFrame:
    """Fused Arrow twin of `hash_walks`: identical rows (same md5 draw
    schedule, same int64 interval arithmetic), computed in ONE
    applyInPandas pass over per-series edge groups instead of n_steps
    chained joins.

    Why it exists: the relational loop unions n_steps+1 step frames
    whose lineages nest (step t replays joins 1..t inside one action —
    O(n_steps^2) join executions), which is correct and shuffle-free
    but pays ~n_steps^2/2 broadcast-join evaluations of plan overhead
    per run.  Per-series transition graphs are tiny by construction
    (Q^2 edges for a quantile graph), so fusing the whole walk into a
    per-series kernel costs one shuffle on series_key and a few
    thousand md5 calls — the 100-TB posture is unchanged
    (embarrassingly parallel across series, no driver state, no
    broadcast) and the ANSI-SQL oracle still replays every row.

    Kept alongside the relational loop (`hash_walks`), which remains
    the pure-Catalyst reference: tests pin frame equality between the
    two and the recursive-CTE oracle."""
    from ts2g2_spark.functions.hashing import h64_py

    sk_type = edges.schema["series_key"].dataType.simpleString()
    schema = f"series_key {sk_type}, walk_id long, step int, node long"

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = pdf["series_key"].iloc[0]
        sks = str(sk)
        g = pdf.sort_values(["src", "dst"])
        srcs = g["src"].to_numpy(np.int64)
        dsts = g["dst"].to_numpy(np.int64)
        ws = g["w"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([srcs, dsts]))
        nn = len(nodes)
        # per-src cumulative [lo, hi) intervals in dst order — the same
        # windowed cumsum the relational loop builds
        out_edges: dict[int, tuple] = {}
        for s in np.unique(srcs):
            m = srcs == s
            d, w = dsts[m], ws[m]
            hi = np.cumsum(w)
            out_edges[int(s)] = (d, hi, int(hi[-1]))
        rows = []
        for wid in range(n_walks):
            idx = h64_py(f"start|{run_seed}|{sks}|{wid}") % nn
            node = int(nodes[idx])
            rows.append((sk, wid, 0, node))
            for t in range(1, n_steps + 1):
                oe = out_edges.get(node)
                if oe is None:  # dead end: the relational join drops too
                    break
                d, hi, tw = oe
                u = h64_py(
                    f"step|{run_seed}|{sks}|{wid}|{t}|{node}") % tw
                node = int(d[int(np.searchsorted(hi, u, side="right"))])
                rows.append((sk, wid, t, node))
        return pd.DataFrame(
            rows, columns=["series_key", "walk_id", "step", "node"])

    return edges.groupBy("series_key").applyInPandas(kern, schema=schema)


def hash_walks(
    edges: DataFrame,
    n_walks: int = 8,
    n_steps: int = 16,
    run_seed: int = 42,
    broadcast_edges: bool = True,
) -> DataFrame:
    """Deterministic REPLAYABLE weighted random walks over per-series
    transition graphs — the oracle-checkable twin of the seeded-RNG
    visitors (ref model.py random walk loop; semantics: weighted node
    choice proportional to edge weight, halt on dead ends or after
    n_steps).

    Where `generate_sequences` replays the reference's Mersenne-Twister
    RNG bit-exactly (and therefore can never have an ANSI-SQL oracle),
    this variant derives EVERY random draw from the portable md5 hash
    (functions.hashing.h64) of (run_seed, series_key, walk_id, step,
    node) and does ALL weight arithmetic in int64:

      start node : node whose dense rank == h64('start|..') % n_nodes
      next node  : out-edge whose cumulative-weight interval
                   [lo, hi) contains h64('step|..') % total_w(node)

    so a recursive-CTE oracle reproduces every row exactly — no float,
    no RNG state, no rounding contract.

    edges: (series_key, src long, dst long, w long) with INTEGER
    weights (e.g. qg_edges_relational(normalize=False) transition
    counts).  Returns the long frame (series_key, walk_id, step, node),
    step 0 = start.

    Scale shape: the cumulative-weight edge frame and the node-index
    frame are built with one window pass each, then the walk loop is
    n_steps BROADCAST hash joins — zero shuffles per step when
    broadcast_edges=True (per-series graphs are small: Q^2 edges for a
    quantile graph; set False for giant graphs to fall back to
    shuffle equi-joins on (series_key, node)).  Walk state rows are
    never collected; fan-out is (n_series x n_walks) rows per step,
    embarrassingly parallel at any corpus size."""
    from ts2g2_spark.functions.hashing import h64

    W = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    mb = F.broadcast if broadcast_edges else (lambda df: df)

    srcw = W.partitionBy("series_key", "src")
    cum = edges.select(
        "series_key", "src", "dst", F.col("w").cast("long").alias("w"),
        F.sum("w").over(srcw.orderBy("dst").rowsBetween(
            W.unboundedPreceding, W.currentRow)).alias("hi"),
        F.sum("w").over(srcw).alias("tw"),
    ).withColumn("lo", F.col("hi") - F.col("w"))

    nodes = (
        edges.select("series_key", F.col("src").alias("node"))
        .unionByName(edges.select("series_key", F.col("dst").alias("node")))
        .distinct()
        .select(
            "series_key", "node",
            (F.row_number().over(
                W.partitionBy("series_key").orderBy("node")) - 1)
            .alias("idx"),
            F.count(F.lit(1)).over(W.partitionBy("series_key"))
            .alias("nn"),
        )
    )

    walk_ids = edges.sparkSession.range(n_walks).select(
        F.col("id").cast("long").alias("walk_id"))
    starts = (
        nodes.select("series_key", "nn").distinct()
        .crossJoin(mb(walk_ids))
        .withColumn(
            "idx",
            h64(F.concat_ws(
                "|", F.lit("start"), F.lit(str(run_seed)),
                F.col("series_key"), F.col("walk_id"))) % F.col("nn"))
        .join(nodes, ["series_key", "idx", "nn"])
        .select("series_key", "walk_id", F.lit(0).alias("step"), "node")
    )

    cumb = mb(cum)
    out = [starts]
    state = starts
    for t in range(1, n_steps + 1):
        u = h64(F.concat_ws(
            "|", F.lit("step"), F.lit(str(run_seed)),
            F.col("series_key"), F.col("walk_id"),
            F.lit(str(t)), F.col("node")))
        nxt = (
            state.withColumn("u", u)
            .join(cumb.withColumnRenamed("series_key", "sk"),
                  (F.col("series_key") == F.col("sk"))
                  & (F.col("node") == F.col("src"))
                  & ((F.col("u") % F.col("tw")) >= F.col("lo"))
                  & ((F.col("u") % F.col("tw")) < F.col("hi")))
            .select("series_key", "walk_id",
                    F.lit(t).alias("step"),
                    F.col("dst").alias("node"))
        )
        out.append(nxt)
        state = nxt
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f)
    return res
