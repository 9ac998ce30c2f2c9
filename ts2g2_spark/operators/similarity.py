"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus with JVM-side zip_with/aggregate arithmetic,
so the scan stays in whole-stage codegen and the corpus is read once.

Scale paths:
  * LSH (random hyperplanes): bucket equi-join, then exact rerank inside
    buckets — sub-linear candidate generation.  Bucketing is ONE Arrow
    kernel doing a single numpy matmul per batch (higher-order functions
    are interpreted, not codegen'd — 96 HOF expressions per row measured
    ~10x slower than the matmul kernel).
  * IVF (inverted file): k-means-lite centroids (seeded, one refinement
    pass), assign corpus to nearest centroid, probe nprobe nearest lists.

Changelog (round 2):
  * lsh_bucket_topk defaults remain 6 planes x 16 tables (AND-OR
    amplification, introduced round 1; the original prototype used
    12 planes x 1 table).  Callers wanting the low-replication variant
    pass n_planes=12, n_tables=1 explicitly.
  * bucket ids are now int64 codes (table_offset + bit code), not strings
    — cheaper shuffle keys; candidate sets are unchanged because the
    hyperplanes are identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ts2g2_spark.functions.hashing import h64_py


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    (query_id, neighbor_id, cosine, rank).  Queries are broadcast (the
    small side by construction); ties broken by neighbor id so results are
    total-ordered and engine-independent.  Self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("cv"))
             / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "lsh") -> np.ndarray:
    rng = np.random.default_rng(h64_py(f"{seed}_{dim}_{n_planes}") % 2**32)
    return rng.normal(size=(n_planes, dim))


def _lsh_bucketed(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, n_tables: int
) -> DataFrame:
    """(_id, _v, _n, bucket) rows: one row per (input row, hash table).

    The sign-bit matrix for ALL tables is one numpy matmul per Arrow batch
    (batch_matrix @ stacked_hyperplanes.T); bucket code = table_offset +
    bits-as-int.  L2 norms ride along from the same batch (vectorized) so
    the rerank never recomputes them per candidate pair.  Hyperplanes are
    deterministic (md5-seeded) and rebuilt identically on every worker —
    no driver action, no broadcast needed at this size (n_tables x
    n_planes x dim doubles)."""
    out_schema = StructType([
        StructField("_id", df.schema[id_col].dataType),
        StructField("_v", ArrayType(DoubleType())),
        StructField("_n", DoubleType()),
        StructField("_buckets", ArrayType(LongType())),
    ])
    weights = 2 ** np.arange(n_planes, dtype=np.int64)
    offsets = np.arange(n_tables, dtype=np.int64) * (2 ** n_planes)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["_v"].to_numpy())  # (B, dim) float64
            if H is None:
                dim = M.shape[1]
                H = np.vstack([
                    _hyperplanes(dim, n_planes, seed=f"lsh_t{t}")
                    for t in range(n_tables)
                ])  # (T*P, dim)
            bits = (M @ H.T) > 0  # (B, T*P)
            codes = (
                bits.reshape(len(pdf), n_tables, n_planes).astype(np.int64)
                @ weights
            ) + offsets[None, :]  # (B, T)
            yield pd.DataFrame({
                "_id": pdf["_id"],
                "_v": pdf["_v"],
                "_n": np.sqrt((M * M).sum(axis=1)),
                "_buckets": list(codes),
            })

    mapped = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(kern, out_schema)
    return mapped.select(
        "_id", "_v", "_n", F.explode("_buckets").alias("bucket"))


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: AND-OR amplified sign-projection LSH — n_tables
    independent hash tables of n_planes bits each (AND within a table, OR
    across tables), bucket equi-join + exact cosine rerank on the candidate
    union.  Recall < 1 by design and tunable: more planes -> higher
    precision/fewer candidates, more tables -> higher recall (the corpus
    index is replicated n_tables x, the standard LSH storage trade).  The
    hyperplanes are deterministic (seeded from md5), so results are
    reproducible across runs/cluster sizes.

    Defaults scan ~n_tables/2^n_planes = 25% of the corpus per query and
    measure ~0.5 top-5 recall on the NEAR-RANDOM synthetic test
    embeddings — the adversarial case for sign LSH; clustered real
    embeddings concentrate cosine mass and recall rises sharply at the
    same settings."""
    cb = _lsh_bucketed(corpus, id_col, vec_col, n_planes, n_tables).select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"),
        F.col("_n").alias("cn"), "bucket")
    qb = _lsh_bucketed(queries, id_col, vec_col, n_planes, n_tables).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"),
        F.col("_n").alias("qn"), "bucket")
    joined = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        # a pair can match in several tables — candidates are a set
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = joined.select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k)


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    n_planes: int = 6,
    n_tables: int = 16,
    max_exact_rows: int = 2_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >=
    threshold) — the fifth dedup family (exact/minhash/simhash/jaccard/
    embedding).

    Two physical paths:
      * exact (default) — block matmul of each Arrow batch against the
        normalized corpus matrix shipped as a broadcast variable.  This is
        the ORACLE BASELINE: complete by construction, O(N^2/batch) work,
        and it requires the (id, vector) matrix to fit in memory (64-dim
        float64 = ~0.5 GB per 1e6 vectors).  The driver materialization
        that builds the broadcast is SIZE-GUARDED: it collects at most
        max_exact_rows + 1 rows and raises loudly if the corpus exceeds
        the cap, instead of silently OOMing at scale — over the cap,
        use_lsh=True is the supported path.
      * use_lsh=True — sign-LSH bucket candidates (see lsh_bucket_topk)
        + exact rerank on candidates only: sub-quadratic, memory-bounded,
        NO driver materialization at all; recall < 1 by design (bounded
        in tests); THE 100 TB path.

    LSH sizing: expected bucket occupancy is n / 2^n_planes per table and
    the intra-bucket join is quadratic in it, so n_planes MUST grow with
    the corpus (~log2(n / target_bucket_size)); for a high threshold each
    extra plane costs little recall (collision prob per plane =
    1 - angle/pi ~ 1 for near-dups) while halving bucket size — at 6M
    vectors, n_planes=24 / n_tables=4 keeps buckets O(1) (measured in
    BENCH/SCALE10X.md).  The rerank is a vectorized Arrow kernel (einsum
    over the candidate batch — the r4 fix; the previous per-pair
    interpreted JVM fold was ~25x slower), and cross-table duplicate
    candidates are dropped AFTER the threshold filter so the dedup
    exchange carries only surviving near-dup pairs, never the full
    candidate stream with its vector payloads.
    """
    if use_lsh:
        b = _lsh_bucketed(corpus, id_col, vec_col, n_planes, n_tables)
        a = b.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                     F.col("_n").alias("na"), "bucket")
        c = b.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                     F.col("_n").alias("nb"), "bucket")
        cand = a.join(c, "bucket").where(F.col("id_a") < F.col("id_b"))
        id_t = corpus.schema[id_col].dataType
        pair_schema = StructType([
            StructField("id_a", id_t),
            StructField("id_b", id_t),
            StructField("cosine", DoubleType()),
        ])

        def rerank(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
            for p in batches:
                if not len(p):
                    continue
                A = np.stack(p["va"].to_numpy())
                B = np.stack(p["vb"].to_numpy())
                cos = np.einsum("ij,ij->i", A, B) / (
                    p["na"].to_numpy() * p["nb"].to_numpy())
                keep = cos >= threshold
                if keep.any():
                    yield pd.DataFrame({
                        "id_a": p["id_a"].to_numpy()[keep],
                        "id_b": p["id_b"].to_numpy()[keep],
                        "cosine": cos[keep],
                    })

        # same pair from multiple tables scores identically (same float
        # expression), so the post-filter distinct is value-stable
        return cand.mapInPandas(rerank, pair_schema).dropDuplicates(
            ["id_a", "id_b"])

    src = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # size-guarded Arrow collect: limit(cap + 1) bounds what ever reaches
    # the driver; seeing cap + 1 rows proves the corpus is over the cap
    # and the exact path refuses to run rather than building an unbounded
    # broadcast (VERDICT r2: the previous unguarded toPandas() was the
    # one scale-killer reachable from a contract query).  toPandas keeps
    # the columnar Arrow transfer — a row-pickled collect() would cost
    # ~10-30x the memory in boxed Row objects below the cap.
    pdf = src.limit(max_exact_rows + 1).toPandas()
    if len(pdf) > max_exact_rows:
        raise ValueError(
            f"cosine_near_pairs(exact): corpus exceeds max_exact_rows="
            f"{max_exact_rows}; the exact all-pairs baseline is "
            f"driver-memory-bounded by design — pass use_lsh=True (the "
            f"scale path) or raise max_exact_rows explicitly")
    out_schema = StructType([
        StructField("id_a", src.schema["_id"].dataType),
        StructField("id_b", src.schema["_id"].dataType),
        StructField("cosine", DoubleType()),
    ])
    if not len(pdf):
        return src.sparkSession.createDataFrame([], out_schema)
    ids_all = pdf["_id"].to_numpy()
    M = np.stack(pdf["_v"].to_numpy())
    norms = np.sqrt((M * M).sum(axis=1))
    bc = src.sparkSession.sparkContext.broadcast((ids_all, M, norms))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_c, Mc, nc = bc.value
        for b_ in batches:
            if not len(b_):
                continue
            Bm = np.stack(b_["_v"].to_numpy())
            bn = np.sqrt((Bm * Bm).sum(axis=1))
            bids = b_["_id"].to_numpy()
            # cosine = dot / (|a||b|) — same association as the SQL oracle
            C = (Bm @ Mc.T) / (bn[:, None] * nc[None, :])
            keep = (C >= threshold) & (bids[:, None] < ids_c[None, :])
            bi, cj = np.nonzero(keep)
            if len(bi):
                yield pd.DataFrame({
                    "id_a": bids[bi], "id_b": ids_c[cj],
                    "cosine": C[bi, cj],
                })

    return src.mapInPandas(kern, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: seeded deterministic centroids (hash-sampled
    corpus vectors + one Lloyd refinement), corpus assigned to nearest list
    (broadcast centroids), queries probe the nprobe nearest lists.

    Seeding plan: `orderBy(xxhash64(id)).limit(n_lists)` compiles to
    TakeOrderedAndProject — a per-partition top-n_lists HEAP plus a driver
    merge of n_partitions x n_lists rows, NOT a global sort/shuffle of the
    corpus (asserted in tests/test_similarity.py::test_ivf_seeding_plan).
    The only driver-side data are the n_lists seed vectors and the n_lists
    Lloyd means — both O(n_lists x dim).

    The index build reads the corpus SOURCE once: the (id, vector)
    projection is cached on first touch (the seed pass), and the Lloyd
    pass, final assignment and rerank all read the cache.  Because the
    cache must outlive plan construction but must not leak pinned
    storage across calls, the result (O(queries x k) rows) is EAGERLY
    materialized via localCheckpoint before the cache is released —
    building this frame runs the jobs at call time (like
    connected_components; documented eager API)."""
    corpus = corpus.select(id_col, vec_col).cache()
    # try/finally: the cache spans every action below (seed, Lloyd,
    # final assignment, eager checkpoint); a failure anywhere must not
    # leak the pinned projection for the rest of the session
    try:
        seed_rows = (
            corpus
            .orderBy(F.xxhash64(F.col(id_col).cast("string")))
            .limit(n_lists)
            .collect()
        )
        if not seed_rows:  # empty corpus: no lists to build, no neighbors
            return corpus.sparkSession.createDataFrame([], StructType([
                StructField("query_id", corpus.schema[id_col].dataType),
                StructField("neighbor_id", corpus.schema[id_col].dataType),
                StructField("cosine", DoubleType()),
                StructField("rank", IntegerType()),
            ]))
        cents = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)

        # one Lloyd pass: the SAME kernel that assigns lists also emits
        # per-(batch, list) partial (count, sum-vector) rows — one row per
        # list per Arrow batch crosses back, combined in numpy here.  (The
        # previous shape — assignment kernel + 64 avg(element_at) JVM
        # aggregates — paid a second full pass over the assignment output.)
        partials = _ivf_lloyd_partials(
            corpus, cents, vec_col).collect()
        n_acc = np.zeros(len(cents))
        s_acc = np.zeros_like(cents)
        for r in partials:
            n_acc[r["list_id"]] += r["n"]
            s_acc[r["list_id"]] += np.asarray(r["s"])
        nz = n_acc > 0
        cents[nz] = s_acc[nz] / n_acc[nz, None]

        corpus_l = _assign_lists(corpus, cents, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            "list_id")
        queries_l = _probe_lists(
            queries, cents, nprobe, id_col, vec_col
        ).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            F.explode("probe_lists").alias("list_id"))
        joined = corpus_l.join(F.broadcast(queries_l), "list_id").where(
            F.col("neighbor_id") != F.col("query_id"))
        scored = joined.select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("cv"))
             / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        res = scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k)
        # materialize the small result so the corpus cache can be released
        # without forcing the final assignment to rescan the source: ONE
        # source scan total (seed builds the cache; Lloyd + assignment +
        # rerank read it)
        return res.localCheckpoint(eager=True)
    finally:
        corpus.unpersist()


def ivf_seed_plan(corpus: DataFrame, n_lists: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """Physical plan of the IVF seeding step (for plan-shape tests)."""
    return (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_lists)
        ._jdf.queryExecution().executedPlan().toString()
    )


def _ivf_distances(df: DataFrame, cents: np.ndarray, id_col: str,
                   vec_col: str, nprobe: int | None,
                   form: str = "expanded") -> DataFrame:
    """Centroid assignment/probing as ONE numpy kernel per Arrow batch
    (||b-c||^2 = |b|^2 - 2 b.c + |c|^2 via a single matmul) — the
    interpreted per-centroid HOF expressions this replaces evaluated
    n_lists x dim higher-order ops per row.  Tie behavior matches the
    HOF version: argmin takes the first minimum; the probe argsort is
    stable on (distance, index).

    form="direct" computes sum((b-c)^2) per centroid instead (k
    vectorized passes, no matmul): the expanded form cancels
    catastrophically (~1e-13 relative) for near-equidistant centroids,
    so oracle-replayable consumers (semantic_dedup's contract mode,
    whose DuckDB twin ranks the same squared sum) use direct, where the
    residual cross-engine gap is summation-order ulps only."""
    C = np.asarray(cents, dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    def _d2(B: np.ndarray) -> np.ndarray:
        if form == "direct":
            return np.stack(
                [((B - c) ** 2).sum(axis=1) for c in C], axis=1)
        return (B * B).sum(axis=1)[:, None] - 2.0 * (B @ C.T) + c2[None, :]
    extra = (StructField("list_id", IntegerType()) if nprobe is None
             else StructField("probe_lists", ArrayType(IntegerType())))
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField(vec_col, ArrayType(DoubleType())),
        extra,
    ])

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf[vec_col].to_numpy())
            d2 = _d2(B)
            out = {id_col: pdf[id_col], vec_col: pdf[vec_col]}
            if nprobe is None:
                out["list_id"] = d2.argmin(axis=1).astype(np.int32)
            else:
                order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
                out["probe_lists"] = list(order.astype(np.int32))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).mapInPandas(kern, out_schema)


def _assign_lists(df: DataFrame, cents: np.ndarray, id_col: str,
                  vec_col: str, form: str = "expanded") -> DataFrame:
    return _ivf_distances(df, cents, id_col, vec_col, nprobe=None,
                          form=form)


def _ivf_lloyd_partials(df: DataFrame, cents: np.ndarray,
                        vec_col: str) -> DataFrame:
    """Per-(Arrow batch, list) partial sums for the Lloyd refinement:
    (list_id, n, s[dim]).  Rows crossing back = n_lists x n_batches."""
    C = np.asarray(cents, dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf[vec_col].to_numpy())
            d2 = (B * B).sum(axis=1)[:, None] - 2.0 * (B @ C.T) + c2[None, :]
            lid = d2.argmin(axis=1)
            rows = []
            for li in np.unique(lid):
                m = B[lid == li]
                rows.append({"list_id": int(li), "n": len(m),
                             "s": m.sum(axis=0)})
            yield pd.DataFrame(rows)

    return df.select(
        F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(kern, "list_id int, n long, s array<double>")


def _probe_lists(df: DataFrame, cents: np.ndarray, nprobe: int,
                 id_col: str, vec_col: str) -> DataFrame:
    return _ivf_distances(df, cents, id_col, vec_col, nprobe=nprobe)


def semantic_dedup(
    emb: DataFrame,
    eps: float = 0.6,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: str = "xxhash64",
    lloyd: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then within each cluster drop
    every vector that has a SMALLER-id neighbor with cosine >= 1 - eps
    (the deterministic keep-one-per-eps-ball rule: the minimum id in a
    ball survives).  Output one row per input vector:
    (id, list_id, keep boolean, dup_of = smallest qualifying neighbor,
    NULL when kept).

    Composite of the IVF machinery: hash-seeded centroids (optionally
    one Lloyd refinement, same kernel as ivf_topk) + the nearest-list
    assignment kernel; the eps-ball scan is then an intra-cluster
    equi-join on list_id — the SemDeDup trade replaces the corpus-wide
    all-pairs scan with per-cluster blocks, O(sum of cluster sizes
    squared) ~ n^2 / n_lists for balanced lists.  Size n_lists ~
    sqrt(n)..n/1000 at scale; a pathologically hot cluster is visible as
    join skew and splits by raising n_lists (re-cluster), the same
    lever the paper uses.

    The keep rule is LOCAL (pairwise), not transitive: in a chain
    a~b~c with a<b<c and no a~c edge, b and c are both dropped with
    dup_of=a and dup_of=b respectively.  For component-resolution
    semantics feed the qualifying pairs to dedup.connected_components
    instead.

    seed_hash="md5" uses the 60-bit md5 hash (h64, (hash, id)-ordered)
    for seeding so an ANSI oracle replays centroid CHOICE bit-for-bit
    (the contract-query mode, paired with lloyd=False so no float mean
    accumulation order enters the result), and assignment switches to
    the direct sum((v-c)^2) distance form — the same squared sum the
    DuckDB twin ranks, so no expanded-form cancellation enters the
    argmin.  Assignment is still not formally bit-pinned: numpy's
    pairwise summation vs a sequential SQL fold can differ in the last
    ulp, so a vector equidistant to two centroids to ~1e-16 relative
    could assign differently (the same class of residual as any
    cross-engine float fold; no such near-tie exists in the contract
    corpus).  The xxhash64 default is the cheaper JVM path.

    Eager API (like ivf_topk): the source projection is cached across
    the seed collect + assignment + pair scan, and the O(n)-row result
    is localCheckpoint'd before the cache releases — ONE source scan."""
    from ts2g2_spark.functions.hashing import h64

    if not 0.0 < eps < 2.0:
        raise ValueError(f"semantic_dedup: need 0 < eps < 2, got {eps}")
    src = emb.select(id_col, vec_col).cache()
    try:
        ids = F.col(id_col).cast("string")
        horder = (F.xxhash64(ids) if seed_hash == "xxhash64"
                  else h64(ids))
        # id tiebreak pins seed choice under hash collisions, matching
        # the oracle's "order by hash, vec_id"
        seed_rows = (src.orderBy(horder, F.col(id_col))
                     .limit(n_lists).collect())
        if not seed_rows:
            return src.sparkSession.createDataFrame([], StructType([
                StructField(id_col, src.schema[id_col].dataType),
                StructField("list_id", IntegerType()),
                StructField("keep", BooleanType()),
                StructField("dup_of", src.schema[id_col].dataType),
            ]))
        cents = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)
        if lloyd:
            partials = _ivf_lloyd_partials(src, cents, vec_col).collect()
            n_acc = np.zeros(len(cents))
            s_acc = np.zeros_like(cents)
            for r in partials:
                n_acc[r["list_id"]] += r["n"]
                s_acc[r["list_id"]] += np.asarray(r["s"])
            nz = n_acc > 0
            cents[nz] = s_acc[nz] / n_acc[nz, None]
        # norms precomputed once per vector (identical float expression
        # to inlining _norm per pair, so the oracle contract is
        # unchanged; saves 2/3 of the per-pair fold work)
        assigned = _assign_lists(
            src, cents, id_col, vec_col,
            form="direct" if seed_hash == "md5" else "expanded",
        ).withColumn("_nrm", _norm(F.col(vec_col)))
        a = assigned.select(F.col(id_col).alias("id_a"),
                            F.col(vec_col).alias("va"),
                            F.col("_nrm").alias("na"), "list_id")
        b = assigned.select(F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("vb"),
                            F.col("_nrm").alias("nb"), "list_id")
        cos = _dot(F.col("va"), F.col("vb")) / (
            F.col("na") * F.col("nb"))
        rm = (
            a.join(b, "list_id")
            .where(F.col("id_a") < F.col("id_b"))
            .where(cos >= F.lit(1.0 - eps))
            .groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
        )
        out = (
            assigned.select(id_col, "list_id")
            .join(rm, F.col(id_col) == F.col("id_b"), "left")
            .select(id_col, "list_id",
                    F.col("dup_of").isNull().alias("keep"), "dup_of")
        )
        return out.localCheckpoint(eager=True)
    finally:
        src.unpersist()


def ivf_cluster_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    nprobe: int = 1,
) -> DataFrame:
    """Oracle-replayable IVF approximate top-k (the contract-mode ANN):
    md5-seeded centroids (h64 order, NO Lloyd pass), direct-form
    nearest-list assignment, and each query — a corpus member named in
    `query_ids` — retrieves its top-k cosine neighbors from its
    `nprobe` nearest lists (by the same direct-form centroid distance,
    ties by list_id — the stable argsort the assignment uses).  The
    deliberately replayable twin of `ivf_topk` (whose xxhash64 seeding
    + Lloyd means have no ANSI-SQL replay): every choice here —
    seeding, assignment, probing, scoring, ranking — is the same
    machinery semantic_dedup's contract mode pins, so recall against
    the exact `cosine_topk` can be VALUE-verified end to end, and the
    recall-vs-nprobe curve (how a 100-TB ANN deployment is tuned) is
    measurable under the same value contract (`ivf_recall_nprobe`).
    Candidate pairs are unique by construction — each corpus vector
    lives in exactly one list and probe lists are distinct — so no
    dedup pass is needed after the probe fan-out.

    (query_id, neighbor_id, cosine, rank) — rank by (round(cosine,
    round_dp) desc, id): ranking on the ROUNDED cosine is the repo's
    cross-engine contract (bm25_topk, select_survivors) — Spark's
    left-fold dot and DuckDB's list_cosine_similarity differ in
    summation order in the last ulp, and an unrounded rank lets a
    near-tie flip top-k membership between engines.  The emitted
    cosine is rounded to the same round_dp.

    Eager API like ivf_topk/semantic_dedup: one cached source scan
    (seed collect + assignment), O(queries x k) result checkpointed
    before the cache releases.  Thin wrapper over `ivf_recall_curve`
    with a single probe level (row-identical by the pinned parity
    test) — ONE implementation of the seeding/assignment/probing/
    scoring contract, so a tie-break or rounding change cannot
    desynchronize the two surfaces."""
    if k < 1 or n_lists < 1:
        raise ValueError("ivf_cluster_topk: need k >= 1 and n_lists >= 1")
    if not 1 <= nprobe <= n_lists:
        raise ValueError("ivf_cluster_topk: need 1 <= nprobe <= n_lists")
    return ivf_recall_curve(
        emb, query_ids, k=k, n_lists=n_lists, nprobes=(nprobe,),
        id_col=id_col, vec_col=vec_col, round_dp=round_dp,
    ).drop("nprobe")


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    round_dp: int = 6,
    group_cols: tuple[str, ...] = (),
    group_values: list[tuple] | None = None,
) -> DataFrame:
    """Per-query retrieval recall of an approximate ANN result against
    exact ground truth — the standard index-quality eval.  Both inputs
    are (query_id, neighbor_id, ...) top-k frames (e.g. ivf_cluster_topk
    / lsh_bucket_topk vs cosine_topk).  Output per query:
    (query_id, n_exact, n_hits, recall = n_hits / n_exact).  Queries
    with an empty exact set produce no row (recall undefined).

    `group_cols` names extra approx-side columns that partition the
    approx frame into independent variants sharing ONE ground truth
    (e.g. the `nprobe` column of `ivf_recall_curve`): the exact set is
    replicated per variant and recall is reported per (variant, query)
    — one pass instead of one recall join per variant.  Pass
    `group_values` (one tuple per variant) when the variant set is
    known: a variant with ZERO approx rows then still yields its
    recall=0 rows (derived-from-data variants would silently vanish —
    an empty index level should read as recall 0, not as absent), and
    the approx lineage isn't scanned a second time for the distinct.

    Scale shape: one equi-join on (group cols + query_id, neighbor_id)
    — both sides are O(variants x queries x k) — and one per-group agg.
    Exact integer counts, one division, engine-exact."""
    gcols = list(group_cols)
    # distinct BOTH sides: duplicate (query, neighbor) rows in either
    # frame fan out the left join — exact dups inflate n_exact (the
    # denominator) and approx dups inflate n_hits; both are sets by
    # construction after this (cheap at O(queries x k))
    e = exact.select("query_id", "neighbor_id").distinct()
    a = approx.select(*gcols, "query_id", "neighbor_id").distinct() \
        .withColumn("_hit", F.lit(1))
    if gcols:
        if group_values is not None:
            groups = approx.sparkSession.createDataFrame(
                [tuple(v) for v in group_values],
                approx.select(*gcols).schema)
        else:
            # derive from the already-projected frame (not the full
            # approx lineage); an all-empty variant cannot appear here
            groups = a.select(*gcols).distinct()
        e = e.crossJoin(F.broadcast(groups))
    per = (
        e.join(F.broadcast(a), [*gcols, "query_id", "neighbor_id"],
               "left")
        .groupBy(*gcols, "query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"),
             F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"))
    )
    return per.select(
        *gcols, "query_id", "n_exact", "n_hits",
        F.round(F.col("n_hits").cast("double")
                / F.col("n_exact").cast("double"), round_dp)
        .alias("recall"),
    )


def ivf_recall_curve(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """All of `[ivf_cluster_topk(nprobe=np) for np in nprobes]` in ONE
    corpus pass: probe once at max(nprobes) carrying the probe RANK
    (the position in the stable (distance, list_id) argsort — exactly
    the order `ivf_cluster_topk` probes in), score each candidate once,
    then derive every level's top-k by filtering `probe rank <= np`
    before the per-(nprobe, query) rank window.  Output rows are
    identical to the per-nprobe calls, with an added `nprobe` column —
    pinned by test — but the corpus is scanned, seeded, assigned and
    scored once instead of len(nprobes) times.

    (nprobe, query_id, neighbor_id, cosine, rank)."""
    from ts2g2_spark.functions.hashing import h64

    nps = sorted(set(nprobes))
    if k < 1 or n_lists < 1:
        raise ValueError("ivf_recall_curve: need k >= 1 and n_lists >= 1")
    if not nps or nps[0] < 1 or nps[-1] > n_lists:
        raise ValueError(
            "ivf_recall_curve: need 1 <= nprobe <= n_lists for every level")
    src = emb.select(id_col, vec_col).cache()
    try:
        seed_rows = (
            src.orderBy(h64(F.col(id_col).cast("string")), F.col(id_col))
            .limit(n_lists).collect())
        if not seed_rows:
            return src.sparkSession.createDataFrame([], StructType([
                StructField("nprobe", IntegerType()),
                StructField("query_id", src.schema[id_col].dataType),
                StructField("neighbor_id", src.schema[id_col].dataType),
                StructField("cosine", DoubleType()),
                StructField("rank", IntegerType()),
            ]))
        cents = np.array([list(r[1]) for r in seed_rows],
                         dtype=np.float64)
        assigned = _assign_lists(src, cents, id_col, vec_col,
                                 form="direct").withColumn(
            "_nrm", _norm(F.col(vec_col)))
        qsub = src.join(F.broadcast(query_ids.select(F.col(id_col))),
                        id_col)
        q = _ivf_distances(
            qsub, cents, id_col, vec_col, nprobe=nps[-1], form="direct"
        ).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("qn"),
            F.posexplode("probe_lists").alias("_pr0", "list_id"))
        c = assigned.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("cv"),
                            F.col("_nrm").alias("cn"), "list_id")
        scored = (
            c.join(F.broadcast(q), "list_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id", "neighbor_id",
                (F.col("_pr0") + 1).alias("_pr"),
                F.round(_dot(F.col("qv"), F.col("cv"))
                        / (F.col("qn") * F.col("cn")),
                        round_dp).alias("cosine"),
            )
        )
        levels = src.sparkSession.createDataFrame(
            [(n,) for n in nps], "nprobe int")
        cand = scored.join(F.broadcast(levels),
                           scored["_pr"] <= F.col("nprobe"))
        w = Window.partitionBy("nprobe", "query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        res = cand.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        ).select("nprobe", "query_id", "neighbor_id", "cosine", "rank")
        return res.localCheckpoint(eager=True)
    finally:
        src.unpersist()


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_levels: int = 127,
) -> DataFrame:
    """Per-vector symmetric integer quantization of an embedding column —
    the standard memory lever for web-scale ANN: int8 codes are 4x
    smaller than float32, so a 100-TB embedding store becomes 25 TB and
    4x more vectors fit in executor memory per scan (SCALE.md has the
    measured recall cost).

    scale = max(|v_i|) / n_levels when max(|v_i|) > 1e-300, else 1.0 —
    so an effectively-zero vector (all-zero, or below the 1e-300
    near-underflow cutoff where scale itself would denormalize and the
    division blow up) quantizes to all zeros instead of dividing by
    zero; quantized_cosine_topk excludes those rows (cosine undefined).
    Each code is clamp(floor(v_i / scale + 0.5), -n_levels, n_levels) —
    the repo's half-up-toward-+inf floor quantizer
    (kernels.quantize_ieee semantics), NOT decimal round(), so every
    engine computes the exact same code from the same IEEE ops.  Above
    the cutoff the max element always maps to +-n_levels, so those
    vectors never quantize to all zeros.

    (id, qvec: array<int>, scale: double).  ONE vectorized numpy kernel
    per Arrow batch (map-only, zero shuffle) — the `_lsh_bucketed`
    pattern.  A pure-HOF version was measured ~10x slower: the `scale`
    reference inside the transform lambda gets CollapseProject-inlined
    and re-evaluates the array_max PER ELEMENT (the rand() barrier is
    column-pruned here).  The kernel is parity-EXACT, not just close:
    every op is elementwise (abs/max/divide/floor/clip) — no summation
    order anywhere — so numpy and DuckDB produce bit-identical codes."""
    if n_levels < 1 or n_levels > 32767:
        raise ValueError("quantize_embeddings: need 1 <= n_levels <= 32767")

    out_schema = StructType([
        StructField(id_col, emb.schema[id_col].dataType),
        StructField("qvec", ArrayType(IntegerType())),
        StructField("scale", DoubleType()),
    ])
    lv = float(n_levels)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(x, dtype=np.float64)
                          for x in pdf["_v"].to_numpy()])
            mx = np.abs(M).max(axis=1)
            scale = np.where(mx > 1e-300, mx / lv, 1.0)
            Q = np.clip(np.floor(M / scale[:, None] + 0.5),
                        -lv, lv).astype(np.int32)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "qvec": list(Q), "scale": scale})

    return emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(kern, out_schema)


def quantized_cosine_topk(
    qcorpus: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    round_dp: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k over quantized codes (the
    measurable half of the int8 story: `recall_at_k` against the
    float-exact `cosine_topk` prices the 4x memory saving in recall).

    Cosine over integer codes is ENGINE-EXACT end to end: the dot and
    both squared norms are integer sums (exact in doubles up to 2^53 —
    n_levels=127 x dim 64 tops out at ~6.6e7, and the norm product at
    ~4.4e15), so sqrt and the final divide are single correctly-rounded
    IEEE ops every engine agrees on.  Scale factors cancel in cosine,
    so they are not read at all.  Ranking uses the floor quantizer
    (floor(cos * 10^dp + 0.5) / 10^dp) with id tie-break — same
    rounded-before-rank contract as ivf_cluster_topk, but here the
    pre-rounding value is already bit-identical cross-engine.

    Queries are a broadcast id list resolved against the corpus (corpus
    members, like the IVF contract); self-matches excluded.  One corpus
    scan, one broadcast join — no shuffle on the corpus side.  All-zero
    codes (only an all-zero input vector produces one) are dropped from
    both sides — cosine is undefined there, and the filter keeps the
    divide total under ANSI.

    (query_id, neighbor_id, cosine, rank)."""
    if k < 1:
        raise ValueError("quantized_cosine_topk: need k >= 1")
    n2 = _dot(F.col(qvec_col), F.col(qvec_col))
    # barrier again: the norm fold must evaluate once per ROW, not once
    # per joined pair (see quantize_embeddings)
    c = qcorpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(qvec_col).alias("cq"), n2.alias("cn2"),
        F.rand(0).alias("_b3"),
    ).where(F.col("cn2") > 0).drop("_b3")
    q = c.join(
        F.broadcast(query_ids.select(F.col(id_col).alias("neighbor_id"))),
        "neighbor_id",
    ).select(F.col("neighbor_id").alias("query_id"),
             F.col("cq").alias("qq"), F.col("cn2").alias("qn2"))
    scale = float(10 ** round_dp)
    cos = (_dot(F.col("qq"), F.col("cq"))
           / F.sqrt(F.col("qn2") * F.col("cn2")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (F.floor(cos * scale + F.lit(0.5)) / scale).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _fold_sum(arr) -> "F.Column":
    """Sequential left fold sum — bit-reproducible cross-engine (DuckDB
    list_reduce replays the identical op order), unlike groupBy sum
    (partition-order nondeterministic) or numpy pairwise summation."""
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


def _sqdist(a, b):
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def pq_codebook(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks in the repo's contract-replayable
    style: split `dim` into `m` subspaces of dim/m, and use the
    subvectors of the first `ks` corpus vectors in md5-h64(id) order as
    each subspace's centroids — the same seeded, no-Lloyd scheme the
    IVF contract pins (float mean accumulation is never oracle-safe).

    Eager like ivf_topk: collects ks seed vectors (O(ks x dim) to the
    driver).  Returns the broadcast-sized frame
    (s:int, j:int, centroid:array<double>) with m x ks rows."""
    from ts2g2_spark.functions.hashing import h64

    if m < 1 or dim % m != 0:
        raise ValueError("pq_codebook: need m >= 1 with m | dim")
    if ks < 1:
        raise ValueError("pq_codebook: need ks >= 1")
    d = dim // m
    seed_rows = (
        emb.select(id_col, vec_col)
        .orderBy(h64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ks).collect())
    rows = []
    for j, r in enumerate(seed_rows):
        v = list(r[1])
        if len(v) != dim:
            raise ValueError(
                f"pq_codebook: vector length {len(v)} != dim {dim}")
        for s in range(m):
            rows.append((s, j, [float(x) for x in v[s * d:(s + 1) * d]]))
    return emb.sparkSession.createDataFrame(
        rows, "s int, j int, centroid array<double>")


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: per (vector, subspace), the index of the L2-nearest
    codebook centroid — (id, s, code).  m codes of log2(ks) bits
    replace dim floats: at m=8/ks=16 a 64-dim float32 vector becomes
    4 bytes, a 64x smaller index (the scale lever IVF's memory story
    lacks).

    Fully relational and deterministic by construction: the squared
    distance is a SEQUENTIAL left fold (bit-identical in DuckDB
    list_reduce), and the argmin is min(struct(dist, j)) — an exact
    lexicographic comparison with the (dist, j) tie rule, computed as a
    partial-aggregatable min (map-side combine; the exchange carries
    one row per (id, s, partial)).  The m x ks explosion is the
    documented CPU cost of oracle replayability — a production encode
    would batch it through one einsum Arrow kernel per the
    _ivf_distances pattern."""
    if m < 1 or dim % m != 0:
        raise ValueError("pq_encode: need m >= 1 with m | dim")
    d = dim // m
    # fail-loud length guard: a shorter vector would slice to a short/
    # empty subvector, zip_with would null-pad, and min(struct(null, j))
    # would silently assign a garbage code (pq_codebook validates only
    # the ks seed vectors)
    checked = F.when(F.size(F.col(vec_col)) == dim,
                     F.col(vec_col).cast("array<double>")).otherwise(
        F.raise_error(F.concat(
            F.lit("pq_encode: vector length "),
            F.size(F.col(vec_col)).cast("string"),
            F.lit(f" != dim {dim}"))))
    sub = emb.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        checked.alias("_v"),
    ).select(
        id_col, "s",
        F.slice("_v", F.col("s") * d + 1, d).alias("_sub"))
    scored = sub.join(F.broadcast(codebook), "s").select(
        id_col, "s", "j",
        _sqdist(F.col("_sub"), F.col("centroid")).alias("dist"))
    return (scored.groupBy(id_col, "s")
            .agg(F.min(F.struct("dist", "j")).alias("_mn"))
            .select(id_col, "s", F.col("_mn.j").alias("code")))


def pq_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: queries stay full precision,
    corpus vectors are m log2(ks)-bit codes; approx cosine =
    sum_s LUT[s][code_s] / (|q| x |reconstruction|) where LUT[s][j] =
    dot(q_s, centroid[s][j]) — the classic Jegou et al. (2011) lookup
    scheme, here as a pure DataFrame composition:

      codes (corpus-wide, reusable)  JOIN broadcast LUT (queries x m x
      ks rows) ON (s, code)  ->  per-(query, neighbor) reduction.

    Every float reduction is an explicit SEQUENTIAL fold — the LUT dot,
    |q|, and the per-pair ADC/reconstruction-norm sums (the m partials
    are collect_list'ed, sorted by s, then left-folded, because a
    groupBy sum over doubles is partition-order nondeterministic and
    never oracle-safe) — so the whole pipeline is value-verifiable
    cross-engine, not just recall-eval'd.  Rank on the floor-quantized
    cosine (round_dp) with id tie-break; self-matches and zero-norm
    sides excluded.  Eager seed collect (pq_codebook).

    (query_id, neighbor_id, cosine, rank)."""
    if k < 1:
        raise ValueError("pq_topk: need k >= 1")
    d = dim // m
    cb = pq_codebook(emb, dim, m=m, ks=ks, id_col=id_col,
                     vec_col=vec_col).withColumn(
        "cnorm2", _dot(F.col("centroid"), F.col("centroid")))
    codes = pq_encode(emb, cb, dim, m=m, id_col=id_col, vec_col=vec_col)
    q = emb.join(F.broadcast(query_ids.select(id_col)), id_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("qn", F.sqrt(_fold_sum(
        F.transform("_qv", lambda x: x * x)))).where(F.col("qn") > 0)
    lut = q.select(
        "query_id", "qn",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col("_qv"),
    ).select(
        "query_id", "qn", "s",
        F.slice("_qv", F.col("s") * d + 1, d).alias("_qsub"),
    ).join(F.broadcast(cb), "s").select(
        "query_id", "qn", "s", "j",
        _dot(F.col("_qsub"), F.col("centroid")).alias("part"), "cnorm2")
    cand = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        # equi-join on BOTH keys: joining on s alone would hash-match
        # every (query, j) LUT row per subspace (corpus x m x queries x
        # ks intermediates) before a filter — (s, j=code) keeps it at
        # corpus x m x queries
        .withColumnRenamed("code", "j")
        .join(F.broadcast(lut), ["s", "j"])
        .groupBy("query_id", "qn", "neighbor_id")
        .agg(F.sort_array(F.collect_list(
            F.struct("s", "part", "cnorm2"))).alias("_ps"))
    )
    adc = _fold_sum(F.transform("_ps", lambda e: e["part"]))
    rnorm2 = _fold_sum(F.transform("_ps", lambda e: e["cnorm2"]))
    scale = float(10 ** round_dp)
    scored = cand.select(
        "query_id", "neighbor_id", adc.alias("_adc"),
        rnorm2.alias("_rn2"), "qn",
    ).where((F.col("_rn2") > 0)
            & (F.col("neighbor_id") != F.col("query_id"))).select(
        "query_id", "neighbor_id",
        (F.floor(F.col("_adc") / (F.col("qn") * F.sqrt(F.col("_rn2")))
                 * scale + F.lit(0.5)) / scale).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _coarse_frame(emb: DataFrame, n_lists: int, id_col: str,
                  vec_col: str) -> DataFrame:
    """(list_id:int, c:array<double>, cn2:double) — md5-h64-seeded
    coarse centroids as a broadcast-sized frame (the IVF contract's
    seeding, relational-frame form)."""
    from ts2g2_spark.functions.hashing import h64

    seed_rows = (
        emb.select(id_col, vec_col)
        .orderBy(h64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_lists).collect())
    rows = [(li, [float(x) for x in r[1]]) for li, r in enumerate(seed_rows)]
    cf = emb.sparkSession.createDataFrame(rows, "list_id int, c array<double>")
    return cf.withColumn("cn2", _dot(F.col("c"), F.col("c")))


def _coarse_assign(emb: DataFrame, coarse: DataFrame, id_col: str,
                   vec_col: str) -> DataFrame:
    """(id, list_id, v, rvec) — nearest coarse centroid by SEQUENTIAL-
    fold L2 (ties (dist, list_id)), plus the residual v - c.  Unlike
    the Arrow-kernel `_assign_lists`, every op here has an exact DuckDB
    twin (list_reduce), so IVFPQ is replayable end to end."""
    scored = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"),
    ).join(F.broadcast(coarse)).select(
        id_col, "_v", "list_id", "c",
        _sqdist(F.col("_v"), F.col("c")).alias("dist"))
    best = (scored.groupBy(id_col)
            .agg(F.min(F.struct("dist", "list_id")).alias("_mn"))
            .select(id_col, F.col("_mn.list_id").alias("list_id")))
    return (emb.select(F.col(id_col),
                       F.col(vec_col).cast("array<double>").alias("v"))
            .join(best, id_col).join(F.broadcast(coarse), "list_id")
            .select(id_col, "list_id", "v",
                    F.zip_with("v", "c", lambda x, y: x - y).alias("rvec")))


def ivfpq_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """IVF x PQ with residual encoding — the FAISS-IVFPQ architecture,
    the composition an actual 100-TB ANN deployment runs: a coarse
    md5-seeded IVF prunes candidates to the query's `nprobe` nearest
    lists, and each corpus vector is stored only as (list_id, m PQ
    codes of its RESIDUAL v - c_list) — m log2(ks) bits + one small
    int per vector.  Residual encoding is what makes coarse+PQ beat
    plain PQ: residuals are smaller and better centered than raw
    vectors, so the same code budget quantizes finer.

    approx dot(q, x) = dot(q, c_list) + sum_s LUT[s][code_s] with
    LUT[s][j] = dot(q_s, rcb[s][j]); |x_hat|^2 = |c_list|^2 +
    2 sum_s CT[list,s,code_s] + sum_s |rcb[s][code_s]|^2 where CT is
    the (n_lists x m x ks) coarse-x-residual-codebook cross-term table
    — every term an exact sequential fold or an exact sum of
    collect_list'ed per-subspace partials folded in s order, so codes,
    cosines, top-k membership and recall are all value-verifiable
    (PQ/int8 contract).  Coarse assignment is the relational fold
    variant (not the Arrow kernel) for the same reason.

    Scale shape: the corpus is scanned for assignment/encode (index
    build, amortized across queries); query-time work is bounded by
    the probed lists (~nprobe/n_lists of the corpus) joined to
    broadcast LUT/CT frames; only (query, candidate) rows shuffle.
    Eager seed collects (coarse + residual codebooks).

    (query_id, neighbor_id, cosine, rank)."""
    if k < 1 or not 1 <= nprobe <= n_lists:
        raise ValueError("ivfpq_topk: need k >= 1, 1 <= nprobe <= n_lists")
    if m < 1 or dim % m != 0:
        raise ValueError("ivfpq_topk: need m >= 1 with m | dim")
    d = dim // m
    coarse = _coarse_frame(emb, n_lists, id_col, vec_col)
    # cache the assignment: three consumers (residual-codebook seed
    # collect, encode, candidate membership) would otherwise re-run the
    # corpus scan + coarse assign each (ivf_recall_curve precedent);
    # released via the eager localCheckpoint of the O(queries x k)
    # result below
    asg = _coarse_assign(emb, coarse, id_col, vec_col).cache()
    try:
        # residual codebooks + codes reuse the plain-PQ machinery verbatim
        rcb = pq_codebook(asg, dim, m=m, ks=ks, id_col=id_col,
                          vec_col="rvec").withColumn(
            "cnorm2", _dot(F.col("centroid"), F.col("centroid")))
        codes = pq_encode(asg.select(id_col, "rvec"), rcb, dim, m=m,
                          id_col=id_col, vec_col="rvec")
        # cross terms: dot(coarse centroid subspace slice, residual centroid)
        ct = coarse.select(
            "list_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "c",
        ).select(
            "list_id", "s", F.slice("c", F.col("s") * d + 1, d).alias("_cs"),
        ).join(F.broadcast(rcb.select("s", "j", "centroid")), "s").select(
            "list_id", "s", "j",
            _dot(F.col("_cs"), F.col("centroid")).alias("cross"))
        # query side: norm, probed lists, dot(q, c_list) for probed lists
        q = emb.join(F.broadcast(query_ids.select(id_col)), id_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ).withColumn("qn", F.sqrt(_fold_sum(
            F.transform("_qv", lambda x: x * x)))).where(F.col("qn") > 0)
        qc = q.join(F.broadcast(coarse)).select(
            "query_id", "qn", "_qv", "list_id", "cn2",
            _sqdist(F.col("_qv"), F.col("c")).alias("dist"),
            _dot(F.col("_qv"), F.col("c")).alias("qdotc"))
        wprobe = Window.partitionBy("query_id").orderBy("dist", "list_id")
        probed = (qc.withColumn("_pr", F.row_number().over(wprobe))
                  .where(F.col("_pr") <= nprobe)
                  .select("query_id", "qn", "_qv", "list_id", "cn2", "qdotc"))
        # residual LUT per (query, s, j)
        lut = q.select(
            "query_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "_qv",
        ).select(
            "query_id", "s",
            F.slice("_qv", F.col("s") * d + 1, d).alias("_qsub"),
        ).join(F.broadcast(rcb), "s").select(
            "query_id", "s", "j",
            _dot(F.col("_qsub"), F.col("centroid")).alias("part"), "cnorm2")
        # candidates: docs in probed lists; per (query, doc) fold the m
        # subspace partials in s order (groupBy sum is never oracle-safe)
        cand_docs = (asg.select(id_col, "list_id")
                     .withColumnRenamed(id_col, "neighbor_id")
                     .join(F.broadcast(probed.select(
                         "query_id", "qn", "list_id", "cn2", "qdotc")),
                         ["list_id"]))
        enriched = (codes.withColumnRenamed(id_col, "neighbor_id")
                    .withColumnRenamed("code", "j")
                    .join(cand_docs.select("neighbor_id", "query_id", "qn",
                                           "list_id", "cn2", "qdotc"),
                          ["neighbor_id"])
                    .join(F.broadcast(lut), ["query_id", "s", "j"])
                    .join(F.broadcast(ct), ["list_id", "s", "j"]))
        grouped = (enriched.groupBy("query_id", "qn", "neighbor_id",
                                    "cn2", "qdotc")
                   .agg(F.sort_array(F.collect_list(F.struct(
                       "s", "part", "cross", "cnorm2"))).alias("_ps")))
        adc = (F.col("qdotc")
               + _fold_sum(F.transform("_ps", lambda e: e["part"])))
        rn2 = (F.col("cn2")
               + 2.0 * _fold_sum(F.transform("_ps", lambda e: e["cross"]))
               + _fold_sum(F.transform("_ps", lambda e: e["cnorm2"])))
        scale = float(10 ** round_dp)
        scored = grouped.select(
            "query_id", "neighbor_id", adc.alias("_adc"), rn2.alias("_rn2"),
            "qn",
        ).where((F.col("_rn2") > 0)
                & (F.col("neighbor_id") != F.col("query_id"))).select(
            "query_id", "neighbor_id",
            (F.floor(F.col("_adc") / (F.col("qn") * F.sqrt(F.col("_rn2")))
                     * scale + F.lit(0.5)) / scale).alias("cosine"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        res = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k)
               .select("query_id", "neighbor_id", "cosine", "rank"))
        # eager O(queries x k) materialization so the cache can release
        return res.localCheckpoint(eager=True)
    finally:
        asg.unpersist()



def mrl_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Matryoshka (MRL, Kusupati et al. 2022) dimension-truncation
    recall curve: for each prefix length d in `dims`, exact cosine
    top-k over the FIRST d embedding dimensions (norms recomputed on
    the slice — true truncate-and-renormalize retrieval), scored
    against the full-dimension exact top-k.  The measurement behind
    the 100 TB embedding-store decision "can we keep d of D dims and
    cut the store (and every scan) D/d-fold?" — the same trade the
    int8/PQ operators measure for precision instead of width.

    Output: (dim, query_id, n_exact, n_hits, recall) — `dims` levels x
    queries rows via the shared `recall_at_k` (group_values pins the
    levels, so a degenerate level reads recall 0, not absent).

    Replay contract: every dot/norm is the repo's explicit sequential
    fold (`_dot`), bit-identical to the oracle's
    list_reduce(list_prepend(0.0, ...)) twin (the pq_topk proof);
    ranking is on round(cosine, round_dp) with the id tie-break — the
    cross-engine round-before-rank contract.

    Scale shape: one broadcast of the (small by contract) query side
    per level plus the full-width ground truth — len(dims)+1 corpus
    scans, each a map-only scored scan + per-query top-k window.
    Candidate frames are O(queries x k); the recall join is broadcast.

    Assumes no zero-norm vectors or prefixes (embedding stores
    normalize; a zero slice would yield NaN cosines, whose sort order
    is engine-specific) — same contract as cosine_topk.
    """
    if not dims or any(d < 1 for d in dims) or len(set(dims)) != len(dims):
        raise ValueError(
            f"mrl_recall: dims must be distinct positive ints, got {dims}")
    if k < 1:
        raise ValueError(f"mrl_recall: k must be >= 1, got {k}")

    def _topk_ids(d: int | None) -> DataFrame:
        vec = (F.slice(F.col(vec_col), 1, d) if d is not None
               else F.col(vec_col))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), vec.alias("cv"))
        q = queries.select(
            F.col(id_col).alias("query_id"), vec.alias("qv"))
        scored = (
            c.crossJoin(F.broadcast(q))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id", "neighbor_id",
                F.round(
                    _dot(F.col("qv"), F.col("cv"))
                    / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                    round_dp).alias("_cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .select("query_id", "neighbor_id")
        )

    full = _topk_ids(None)
    approx = None
    for d in dims:
        lvl = _topk_ids(d).select(
            F.lit(d).alias("dim"), "query_id", "neighbor_id")
        approx = lvl if approx is None else approx.unionByName(lvl)
    return recall_at_k(
        approx, full, round_dp=round_dp, group_cols=("dim",),
        group_values=[(d,) for d in dims])
