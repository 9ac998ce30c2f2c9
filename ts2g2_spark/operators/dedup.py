"""Deduplication operators for large-scale training-data pipelines.

All four families, Spark-first:
  * exact          — md5 hash-groupBy (partial-agg'd; the 100 TB shuffle
                     carries one row per distinct hash)
  * MinHash + LSH  — shingle -> K minhashes -> B bands -> bucket equi-join;
                     candidate verification by exact Jaccard on the
                     candidates only (never all-pairs)
  * SimHash        — 64-bit sign-of-weighted-sum fingerprint; near-dup by
                     hamming distance via bit_count(xor) on banded buckets
  * n-gram Jaccard — exact set similarity via shingle inner join (bounded
                     by shared-shingle pairs, not n^2)

Hashes are md5-derived (functions/hashing.py) so oracle engines reproduce
them bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ts2g2_spark.functions.hashing import h64, h64_py, normalize_text

def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: (content_hash, dup_cnt, keep_id) for groups with
    >1 member.  keep_id = min doc_id (deterministic survivor)."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_cnt"), F.min("doc_id").alias("keep_id"))
        .where(F.col("dup_cnt") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text",
             n_words: int = 5) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, sh string).
    Pure Catalyst: split + sequence/transform + explode + distinct-per-doc
    via array_distinct before the explode (cheaper than global distinct)."""
    words = F.col("_ws")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n_words, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n_words)),
        )
    )
    # rand() = projection-collapse barrier (see shingles_hashed below):
    # without it Catalyst inlines the normalize+split regex chain into
    # every transform element — O(n_words) full-text regex passes per doc
    return (
        docs.select(
            "doc_id", F.split(normalize_text(text_col), " ").alias("_ws"),
            F.rand(0).alias("_b1"))
        .select("doc_id", F.explode(grams).alias("sh"))
        .where(F.length("sh") > 0)
    )


def contamination_report(
    docs: DataFrame,
    text_col: str = "text",
    n_words: int = 3,
    bench_fraction: float = 0.05,
    salt: str = "bench",
    broadcast_bench: bool = True,
    bench_source: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination census: for every TRAINING doc, the
    fraction of its distinct word n-grams that appear anywhere in the
    benchmark/eval split.  Output (doc_id, n_grams, n_contaminated,
    contamination) — the filter/flag decision downstream is policy.

    The benchmark split is the deterministic md5-bucket sample
    (sampling.hash_partition_pred), so bench and train are provably
    disjoint and any engine can replay the exact membership.  In a real
    pipeline the bench side is a held-out eval suite — small by nature —
    so its distinct-gram set is broadcast and the training corpus
    streams past it map-side with zero shuffle of the big side
    (`broadcast_bench=False` falls back to a gram-keyed shuffle join for
    pathological benches).  Gram sets reuse `shingles` (normalized text,
    per-doc distinct before explode)."""
    from ts2g2_spark.operators.sampling import hash_partition_pred

    is_bench = hash_partition_pred("doc_id", bench_fraction, salt)
    # bench_source lets a pipeline score a FILTERED training frame
    # against the UN-filtered eval split (grams of an eval doc the
    # quality gates dropped must still count as contamination) without
    # shingling the raw corpus on the big train side
    sh = shingles(docs.where(~is_bench), text_col, n_words)
    bench_grams = (
        shingles((bench_source if bench_source is not None else docs)
                 .where(is_bench), text_col, n_words)
        .select("sh").distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    # ONE pass over the training shingles: left-join the bench marker
    # and count total + matched in the same aggregate (two separate
    # totals/hits branches would re-execute the shingle projection —
    # the dominant cost at scale — once per branch)
    return (
        sh.join(bench_grams.withColumn("_hit", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.count("_hit").alias("n_contaminated"))
        .select(
            "doc_id", "n_grams", "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6)
            .alias("contamination"),
        )
    )


def _gram_exprs(text_col: str, n_words: int, word_hash: str,
                distinct: bool):
    """Shared gram-expression builder for `shingles_hashed` and
    `positioned_shingles`: (word-hash array expr, gram array expr).

    Numeric gram hashing: hash each WORD once, then combine n
    consecutive word-hashes with position-shifted XOR — no per-gram
    string concat (the string build dominated the stage ~3x).  The
    shifted-xor combiner is order-sensitive and collision-equivalent to
    a random 64-bit hash for non-adversarial text.

    The CASE WHEN makes the gram expression TOTAL: without it, an
    unpinned session's InferFiltersFromGenerate inlines the transform
    into a predicate pushed below the caller's size(wh) filter, where
    short docs make sequence(1, size-(n-1)) DESCEND into
    element_at(wh, <=0) — an ANSI crash.  CaseWhen branches evaluate
    lazily, so short docs never touch element_at."""
    words = F.filter(F.split(normalize_text(text_col), " "),
                     lambda w: w != F.lit(""))
    if word_hash == "xxhash64":
        wh = F.transform(words, lambda w: F.xxhash64(w))
    elif word_hash == "md5":
        wh = F.transform(words, h64)
    else:
        raise ValueError(word_hash)
    shift = " ^ ".join(
        f"shiftleft(element_at(wh, i + {k}), {n_words - 1 - k})"
        for k in range(n_words))
    body = (f"transform(sequence(1, size(wh) - {n_words - 1}), "
            f"i -> {shift})")
    if distinct:
        body = f"array_distinct({body})"
    grams = F.expr(
        f"case when size(wh) >= {n_words} then {body} else array() end")
    return wh, grams


def shingles_hashed(docs: DataFrame, text_col: str = "text",
                    n_words: int = 5,
                    word_hash: str = "xxhash64") -> DataFrame:
    """(doc_id, n_sh, sh:long) — hashed word n-gram shingles with the
    per-doc distinct-shingle count carried from the pre-explode array
    (zero extra shuffles).  THE shared input frame for minhash signatures
    and exact-Jaccard verification: pass the SAME DataFrame object to
    both (+ .cache()) so Catalyst reuses one materialization.

    word_hash: "xxhash64" (default — JVM intrinsic, the hot path) or
    "md5" (h64: first 15 md5 hex chars as int64 — bit-reproducible in any
    ANSI-ish oracle engine, used by the driver-contract minhash query so
    DuckDB can replay the exact signatures).  A gram-hash collision only
    perturbs a Jaccard count if it happens INSIDE one doc pair
    (~1e-13 at 1e7 shingles)."""
    wh, grams = _gram_exprs(text_col, n_words, word_hash, distinct=True)
    # the rand() columns are PROJECTION-COLLAPSE BARRIERS: without them
    # Catalyst inlines `wh` into every element_at reference inside `grams`
    # and `g` into both size() and explode(), re-evaluating the word-hash
    # HOF chain O(grams) times per row (measured 44s vs 2s on 5k docs —
    # CollapseProject has no CSE for interpreted higher-order functions;
    # a nondeterministic expression in the inner project blocks collapse)
    return (
        docs.select("doc_id", wh.alias("wh"), F.rand(0).alias("_b1"))
        .where(F.size("wh") >= n_words)
        .select("doc_id", grams.alias("g"), F.rand(0).alias("_b2"))
        .select("doc_id", F.size("g").alias("n_sh"),
                F.explode("g").alias("sh"))
    )


def shingles_hashed_md5_kernel(docs: DataFrame, text_col: str = "text",
                               n_words: int = 5) -> DataFrame:
    """Row-identical twin of `shingles_hashed(word_hash="md5")` as ONE
    Arrow kernel.  Same (doc_id, n_sh, sh) rows as the Catalyst path
    (set-equal; row order differs), so it feeds the same minhash/jaccard
    aggregates and keeps the same DuckDB oracle.  Equality with the
    Catalyst path is pinned in tests/test_dedup.py.

    Vectorized across the batch (round 3 — previously a per-doc Python
    loop): all docs' words flatten into one array with a doc index, the
    batch vocabulary is ONE np.unique (each distinct word md5-hashed
    once, cached across batches), the shifted-xor gram combine runs over
    the FLAT hash stream (windows straddling a doc boundary are masked
    out), and per-doc distinct is a lexsort + first-occurrence mask."""
    import re

    # re.ASCII: Catalyst's Java regex and DuckDB's RE2 treat \s as ASCII
    # whitespace; Python's default Unicode \s would also swallow NBSP
    # etc. and silently diverge from the twins on non-ASCII text.  After
    # the strip only [a-z0-9] + ASCII whitespace remain, so pandas'
    # no-arg str.split() (Unicode ws) is exactly the ASCII split here.
    strip = re.compile(r"[^a-z0-9\s]", re.ASCII)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab: dict[str, int] = {}

        def h(w: str) -> int:
            v = vocab.get(w)
            if v is None:
                v = h64_py(w)
                vocab[w] = v
            return v

        for pdf in batches:
            if not len(pdf):
                continue
            toks = (
                pdf["text"].fillna("").str.lower()
                .str.replace(strip, "", regex=True).str.split()
            )
            lens = toks.str.len().to_numpy(dtype=np.int64)
            keep = np.flatnonzero(lens >= n_words)
            if not len(keep):
                continue
            flat = np.concatenate([toks.iat[i] for i in keep])
            uw, inv = np.unique(flat, return_inverse=True)
            hvoc = np.fromiter((h(w) for w in uw.tolist()),
                               dtype=np.int64, count=len(uw))
            whf = hvoc[inv]  # flat word-hash stream, doc-major
            klens = lens[keep]
            m = len(whf) - n_words + 1
            g = np.zeros(m, dtype=np.int64)
            for k in range(n_words):
                g ^= whf[k: m + k] << np.int64(n_words - 1 - k)
            # a window starting at p is valid iff it ends inside the
            # same doc: doc_of[p] == doc_of[p + n_words - 1]
            doc_of = np.repeat(np.arange(len(keep)), klens)
            pos = np.flatnonzero(doc_of[:m] == doc_of[n_words - 1:])
            gv, dv = g[pos], doc_of[pos]
            order = np.lexsort((gv, dv))
            gs, ds = gv[order], dv[order]
            first = np.ones(len(gs), dtype=bool)
            first[1:] = (ds[1:] != ds[:-1]) | (gs[1:] != gs[:-1])
            gk, dk = gs[first], ds[first]
            n_sh = np.bincount(dk, minlength=len(keep))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[keep][dk],
                "n_sh": n_sh[dk],
                "sh": gk,
            })

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        kern, schema="doc_id long, n_sh long, sh long")


def cap_shingles(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles appearing in more than max_doc_freq documents and
    recount n_sh over the surviving set.

    THE 100 TB guard for the Jaccard self-join: one boilerplate shingle
    shared by D documents fans the join out to D^2/2 rows (a web corpus
    has such shingles at D ~ 1e8).  The DF aggregate is partial-agg'd (one
    row per distinct shingle in the exchange); the hot set is tiny by
    construction, so it broadcasts into a left-anti join.  Semantics of
    the downstream jaccard become "Jaccard over shingles with DF <=
    max_doc_freq" — a documented, monotone restriction (boilerplate
    carries no near-dup signal), NOT an approximation of exact Jaccard."""
    hot = (
        sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("sh")
    )
    # no broadcast hint: with a generous cap the hot set is tiny and AQE
    # broadcasts it anyway; with an aggressive cap it can approach the
    # vocabulary size, where a forced broadcast would OOM the driver
    kept = sh.join(hot, "sh", "left_anti")
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    return (
        kept.drop("n_sh")
        .join(sizes, "doc_id")
        .select("doc_id", F.col("_n").alias("n_sh"), "sh")
    )


def positioned_shingles(
    docs: DataFrame, text_col: str = "text", n_words: int = 10,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """(doc_id, idx, sh): every word n-gram OCCURRENCE with its 0-based
    word-start index — the positional twin of `shingles_hashed` (same
    word-hash + shifted-xor combiner, same collapse barriers, but
    posexplode and no per-doc distinct: span detection needs positions
    and repeats).  Docs with < n_words words emit nothing."""
    wh, grams = _gram_exprs(text_col, n_words, word_hash, distinct=False)
    return (
        docs.select("doc_id", wh.alias("wh"), F.rand(0).alias("_b1"))
        .where(F.size("wh") >= n_words)
        .select("doc_id", grams.alias("g"), F.rand(0).alias("_b2"))
        .select("doc_id", F.posexplode("g").alias("idx", "sh"))
    )


def duplicated_spans(
    docs: DataFrame, text_col: str = "text", n_words: int = 10,
    min_count: int = 2, word_hash: str = "xxhash64",
    positions_frame: DataFrame | None = None,
) -> DataFrame:
    """Exact-substring-style duplicate span detection at word
    granularity: maximal spans of each document covered by word n-grams
    that occur >= min_count times across the corpus (incl. within one
    doc).  Output (doc_id, start_word, end_word, span_words,
    n_dup_shingles) — one row per maximal span; the downstream
    cut/filter decision stays policy.

    This is the scalable relational form of suffix-array substring
    dedup: fixed-width shingles instead of arbitrary-length suffixes
    (spans shorter than n_words words are invisible — the documented
    resolution limit), so the whole computation is three partial-agg'd /
    equi-keyed exchanges and never builds a global ordered structure:

      occurrence stream (tokens-sized, map-only)
        -> groupBy(sh) count, filtered to duplicated shingles
        -> inner equi-join back onto the stream (both sides keyed on sh)
        -> per-doc window: positions within n_words of the previous one
           merge (overlapping or touching coverage — classic
           gaps-and-islands: flag + running sum), then one aggregate per
           island.

    The occurrence stream is consumed TWICE (the corpus count aggregate
    and the join-back side), and the tokenize+hash projection is the
    dominant stage cost — pass `positions_frame` (a cached/checkpointed
    `positioned_shingles` result, same convention as `shingle_frame` in
    minhash_signatures) to materialize it once instead of recomputing
    per consumer.
    """
    pos = (positions_frame if positions_frame is not None
           else positioned_shingles(docs, text_col, n_words, word_hash))
    dup = (
        pos.groupBy("sh").agg(F.count(F.lit(1)).alias("_cnt"))
        .where(F.col("_cnt") >= min_count)
        .select("sh")
    )
    marked = pos.join(dup, "sh").select("doc_id", "idx")
    w = Window.partitionBy("doc_id").orderBy("idx")
    lag = F.lag("idx").over(w)
    flagged = marked.select(
        "doc_id", "idx",
        F.when(lag.isNull() | (F.col("idx") - lag > n_words), 1)
        .otherwise(0).alias("_new"),
    )
    islands = flagged.select(
        "doc_id", "idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("_isl"),
    )
    return (
        islands.groupBy("doc_id", "_isl")
        .agg(F.min("idx").cast("long").alias("start_word"),
             (F.max("idx") + F.lit(n_words - 1)).cast("long")
             .alias("end_word"),
             F.count(F.lit(1)).alias("n_dup_shingles"))
        .select(
            "doc_id", "start_word", "end_word",
            (F.col("end_word") - F.col("start_word") + 1)
            .alias("span_words"),
            "n_dup_shingles",
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 64,
    n_words: int = 5, shingle_frame: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig array<long>[n_hashes]).  One shuffle: groupBy(doc_id)
    with n_hashes min() partial aggregates — map-side combine keeps the
    exchange at one row per doc.

    Permutations are XOR-mask reorderings of the 64-bit shingle hash
    (min over sh ^ mask_i): one bitwise op per (row, hash) — the textbook
    (a*h+b) mod p family costs ~10x in the hot aggregate (and overflows
    int64 under ANSI semantics).  The xor family's weaker independence
    only affects candidate RECALL, which the exact-Jaccard verification
    pass bounds anyway."""
    sh = (shingle_frame if shingle_frame is not None
          else shingles_hashed(docs, text_col, n_words))
    masks = [h64_py(f"minhash_mask_{i}") for i in range(n_hashes)]
    aggs = [
        F.min(F.expr(f"sh ^ {m}L")).alias(f"m{i}")
        for i, m in enumerate(masks)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("sig")
    )


def _banded_signatures(sigs, bands: int, n_hashes: int | None):
    """(doc_id, band_id, band_hash) band frame shared by the full and
    incremental LSH candidate generators; None for an empty frame with
    no inferable signature width.  The width guard is conditional on
    the band array itself so the optimizer cannot prune it: a
    caller-supplied n_hashes wider than the real signature raises
    instead of silently hashing NULL-truncated bands (which would make
    every doc collide)."""
    if n_hashes is not None:
        n = n_hashes
    else:
        row = sigs.select(F.size("sig")).first()
        if row is None:
            return None
        n = row[0]
    rows = n // bands
    bands_arr = F.array(*[
        F.md5(F.concat_ws(",", *[
            F.element_at("sig", b * rows + r + 1).cast("string")
            for r in range(rows)
        ]))
        for b in range(bands)
    ])
    guarded = F.when(F.size("sig") == n, bands_arr).otherwise(
        F.raise_error(F.lit(
            f"lsh_candidate_pairs: size(sig) != n_hashes={n}")))
    return sigs.select(
        "doc_id",
        F.posexplode(guarded).alias("band_id", "band_hash"),
    )


def _bucketed_bands(banded: DataFrame) -> DataFrame:
    """Attach per-(band_id, band_hash) bucket size `_bsz` and min doc_id
    `_bmin` via one window pass — a single hash exchange on the bucket
    key, which the downstream bucket self-join then reuses (same
    partitioning, no second shuffle of the band frame)."""
    w = Window.partitionBy("band_id", "band_hash")
    return banded.select(
        "doc_id", "band_id", "band_hash",
        F.count(F.lit(1)).over(w).alias("_bsz"),
        F.min("doc_id").over(w).alias("_bmin"),
    )


def _star_pairs(hot: DataFrame) -> DataFrame:
    """Star-pair a hot bucket around its min-id member: k-1 pairs
    (bucket_min, member) instead of k^2/2 all-pairs.  doc_a < doc_b by
    construction (_bmin is the bucket minimum)."""
    return hot.where(F.col("doc_id") != F.col("_bmin")).select(
        F.col("_bmin").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, n_hashes: int | None = None,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Band the signatures and bucket-join: docs sharing any band land in
    the same bucket.  Output distinct (doc_a < doc_b) candidate pairs.
    The join is an equi-join on (band_id, band_hash) — shuffle-partitioned
    by bucket, never all-pairs.

    THE 100 TB guard for the band self-join (`cap_shingles`' twin): a
    boilerplate family of k near-identical docs (templated pages,
    mirrors) shares identical minhash bands, so an uncapped bucket join
    emits k^2/2 pairs — output explosion AQE cannot split.  Buckets
    larger than `max_bucket_size` are STAR-PAIRED around their min-id
    member (k-1 pairs) instead of all-paired: in the CANDIDATE graph
    the family stays one connected component (every member reaches the
    hub), only the redundant clique edges are dropped.

    Precision caveat for verify-then-component pipelines: a downstream
    exact-similarity filter (jaccard >= t) only examines the emitted
    star edges, so a member pair that would pass the verify can go
    unexamined if BOTH their hub edges fail it — the standard
    recall-vs-blowup trade every capped MinHashLSH makes.  In practice
    a bucket only exceeds a 4096-cap when thousands of docs share
    identical minhash bands (near-identical text, hub included); set
    `max_bucket_size=None` to restore unconditional all-pairs where
    post-verify exactness matters more than the k^2 guard.

    Pass n_hashes (the signature width) to keep plan construction
    action-free; when omitted, a one-row fallback job reads it from the
    frame.

    Eager when capping (the connected_components/ivf_topk posture): the
    band frame localCheckpoints at construction, because its three
    consumers (both self-join sides + the star branch) sit in sibling
    subtrees Spark does not reuse an exchange across — uncheckpointed,
    the full signature lineage recomputes once per consumer (measured
    3.4s -> 2.0s on the sf0.1 contract query).  At 100 TB this
    materialization IS the stored-LSH-index build the incremental path
    assumes: band once, write, then every candidate scan reads the
    index instead of re-hashing the corpus."""
    banded = _banded_signatures(sigs, bands, n_hashes)
    if banded is None:  # empty frame: no pairs, and no width to infer
        return sigs.sparkSession.createDataFrame(
            [], f"doc_a {sigs.schema['doc_id'].dataType.simpleString()},"
                f" doc_b {sigs.schema['doc_id'].dataType.simpleString()}")
    star = None
    if max_bucket_size is not None:
        banded = banded.localCheckpoint(eager=True)
        bb = _bucketed_bands(banded)
        banded = bb.where(F.col("_bsz") <= max_bucket_size).drop(
            "_bsz", "_bmin")
        star = _star_pairs(bb.where(F.col("_bsz") > max_bucket_size))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def incremental_lsh_candidates(
    sigs: DataFrame,
    new_ids: DataFrame,
    bands: int = 8,
    n_hashes: int | None = None,
    broadcast_new: bool | None = None,
    max_bucket_size: int | None = 4096,
    broadcast_max_rows: int = 500_000,
) -> DataFrame:
    """Incremental near-dup candidate pairs: the LSH pairs TOUCHING a
    new document batch — new-vs-corpus and new-vs-new, never
    corpus-vs-corpus — so ingesting a batch into an already-deduped
    corpus re-examines only the buckets the batch lands in.

    `sigs` is the FULL signature frame (existing corpus + the new
    batch, the stored index in a real pipeline); `new_ids` names the
    batch (one id column matching sigs' doc_id).  Output: distinct
    (doc_a < doc_b) with at least one side new — by construction
    exactly the full-recompute pair set restricted to pairs touching
    the batch (the equality an oracle can assert).

    Scale shape: the corpus side is banded once (the same band frame
    the full generator uses — in a real pipeline this is the stored
    LSH index, scanned not rebuilt); the batch side is banded and
    BROADCAST when small, so the join examines only buckets containing
    a new doc — O(|batch| x bucket occupancy), independent of corpus
    size.  `broadcast_new=None` (default) auto-gates: one count() of
    `new_ids` at construction, broadcast iff |batch| x bands <=
    broadcast_max_rows (a "batch" that is a large corpus fraction must
    NOT bypass autoBroadcastJoinThreshold via a forced hint — it falls
    back to the bucket-keyed shuffle join).  Pass True/False to skip
    the count and force either path.

    Hot buckets (> max_bucket_size members) are star-paired around the
    bucket min exactly as in `lsh_candidate_pairs`, restricted to stars
    touching the batch — so the output stays equal to the full
    recompute restricted to batch-touching pairs, cap included.  The
    bucket stats are computed ONLY over buckets the batch touches (a
    semi-join on the batch's (band_id, band_hash) keys BEFORE the
    window): a bucket's size and min-id member do not depend on the
    batch, so touched-bucket stats equal the full generator's stats for
    those buckets, while untouched buckets — which can contribute no
    batch-touching pair or star — never reach the window exchange.
    This keeps the cap from re-introducing the full-corpus shuffle the
    incremental path exists to avoid: the shuffled rows are
    O(|batch| x bands x bucket occupancy), independent of corpus
    size."""
    banded = _banded_signatures(sigs, bands, n_hashes)
    if banded is None:
        return sigs.sparkSession.createDataFrame(
            [], f"doc_a {sigs.schema['doc_id'].dataType.simpleString()},"
                f" doc_b {sigs.schema['doc_id'].dataType.simpleString()}")
    ids = new_ids.select(new_ids.columns[0]).toDF("doc_id")
    if broadcast_new is None:
        broadcast_new = ids.count() * bands <= broadcast_max_rows
    star = None
    if max_bucket_size is not None:
        keys = banded.join(ids, "doc_id").select(
            "band_id", "band_hash").distinct()
        if broadcast_new:
            keys = F.broadcast(keys)
        touched = banded.join(keys, ["band_id", "band_hash"], "left_semi")
        bb = _bucketed_bands(touched)
        banded = bb.where(F.col("_bsz") <= max_bucket_size).drop(
            "_bsz", "_bmin")
        all_star = _star_pairs(bb.where(F.col("_bsz") > max_bucket_size))
        hub_new = ids.select(F.col("doc_id").alias("doc_a"))
        leaf_new = ids.select(F.col("doc_id").alias("doc_b"))
        if broadcast_new:
            hub_new, leaf_new = F.broadcast(hub_new), F.broadcast(leaf_new)
        star = all_star.join(hub_new, "doc_a", "left_semi").unionByName(
            all_star.join(leaf_new, "doc_b", "left_semi"))
    banded_new = banded.join(ids, "doc_id")
    if broadcast_new:
        banded_new = F.broadcast(banded_new)
    a = banded.alias("a")
    b = banded_new.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_words: int = 5,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    shingle_frame: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs >= threshold.

    Without candidates: pairs sharing >=1 shingle (inner join on shingle,
    group to intersection counts).  With candidates (e.g. LSH output): only
    verifies those pairs.  Output (doc_a, doc_b, jaccard).

    max_doc_freq: when set, shingles appearing in more than that many docs
    are dropped BEFORE the self-join (see cap_shingles) — the web-corpus
    boilerplate guard; jaccard is then over the capped shingle universe.
    Default None = exact jaccard (the oracle-checked path)."""
    # join on xxhash64 of the shingle, not the string: the self-join
    # shuffle carries 8-byte keys instead of ~30-byte strings.  A 64-bit
    # collision would need two distinct shingles in the SAME doc pair to
    # collide — ~1e-13 at 1e7 distinct shingles, below any float tolerance
    # in the gate.  n_sh rides along from the pre-explode array size, so
    # the size-ratio prune costs zero extra shuffles.
    sh = (shingle_frame if shingle_frame is not None
          else shingles_hashed(docs, text_col, n_words).cache())
    if max_doc_freq is not None:
        sh = cap_shingles(sh, max_doc_freq)
    sizes = sh.groupBy("doc_id").agg(F.first("n_sh").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               # size-ratio prune: jaccard >= t forces
               # min(n)/max(n) >= t — drop impossible pairs pre-aggregate
               & (F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                  >= threshold * F.greatest(F.col("a.n_sh"),
                                            F.col("b.n_sh"))))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(
            candidates.select(
                F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb")),
            (F.col("doc_a") == F.col("ca")) & (F.col("doc_b") == F.col("cb")),
            "inner",
        ).select("doc_a", "doc_b", "inter")
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
             ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 25,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Resolve near-dup pairs into duplicate GROUPS: (doc_id, component)
    where component = min doc_id of the connected component — the step
    between pair detection and survivor selection (keep component, drop
    the rest) that every dedup pipeline needs.

    TWO physical paths, auto-selected on the materialized edge count:

    * edge list <= local_threshold (the COMMON case — near-dup pairs are
      a vanishing fraction of a deduplicated corpus, so even a 100 TB
      run usually produces a pair list that fits in driver memory):
      single-pass union-find on the driver.  Each distributed round of
      the iterative algorithm costs a full job (join + shuffle +
      checkpoint barrier + convergence action); when the edges fit in
      one process, O(E α(E)) union-find beats O(log diameter) cluster
      barriers by orders of magnitude.  The threshold bounds driver
      memory explicitly: the edge transfer is columnar Arrow (~16
      bytes/edge for int64 ids) and the union-find dict holds one boxed
      Python entry per NODE (~100 bytes) — size the threshold for the
      node count too, not just edges (1M edges ≲ 2M nodes ≈ 200 MB
      worst case).
    * larger: iterative min-label propagation with POINTER JUMPING —
      each round every node takes min(own label, neighbors' labels),
      then labels chase one hop through the label table
      (comp <- label(comp)), which doubles propagation distance per
      round: O(log diameter) rounds even on adversarial chains (pinned
      by the 40-chain test, which forces this path with
      local_threshold=0).  Per round: two equi-joins + one partial-agg'd
      groupBy, labels localCheckpoint'ed so lineage stays O(1); the
      shuffle carries one row per (node, candidate label) — scale-safe.

    Both paths produce identical output (component = min doc_id) and are
    pinned against each other in tests/test_dedup.py.

    Only docs appearing in a pair are returned (singletons are trivially
    their own component).  Converges early when a round changes no
    label; raises if max_iter rounds do not converge.

    EAGER: this function runs the iterative jobs at CALL time — the
    symmetric edge list is localCheckpoint'ed (materializing the whole
    upstream pair pipeline) and each round executes one job to refresh +
    convergence-check the label table.  Deliberate: the converged labels
    are a materialized artifact reused by every downstream consumer, and
    convergence detection is inherently an action.  Callers composing
    lazy pipelines should invoke this last (building the frame triggers
    the full jaccard/LSH upstream)."""
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    # materialize the edge list ONCE: the path probe and both paths then
    # consume the checkpointed rows — the upstream pair pipeline
    # (jaccard/LSH joins) runs exactly once either way
    edges = edges.localCheckpoint()
    # path probe and local-path transfer fused into ONE guarded Arrow
    # collect (limit(threshold+1).toPandas): seeing threshold+1 rows
    # proves the edge list is over the cap WITHOUT an extra count job;
    # under it, the frame already holds every edge
    epdf = edges.limit(local_threshold + 1).toPandas()

    if len(epdf) <= local_threshold:
        from pyspark.sql.types import StructField, StructType

        dt = pairs.schema["doc_a"].dataType
        schema = StructType([StructField("doc_id", dt),
                             StructField("component", dt)])
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(epdf["a"].tolist(), epdf["b"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root: the surviving root is the smaller
                # label, so the final root of every node IS the min of
                # its component — same output as the distributed path
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out = [(n, find(n)) for n in parent]
        return pairs.sparkSession.createDataFrame(out, schema)

    # distributed path: symmetric edge list built from the checkpointed
    # edges and materialized once more (it is consumed every round)
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    lab = (
        sym.select(F.col("a").alias("n")).distinct()
        .select("n", F.col("n").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb = (
            sym.join(lab, sym["b"] == lab["n"])
            .select(F.col("a").alias("n"), F.col("comp"),
                    F.lit(None).cast(lab.schema["comp"].dataType)
                    .alias("own"))
        )
        # each node contributes its OWN label tagged in `own`; min(own)
        # recovers the previous label in the SAME aggregate, so the
        # convergence check below is a scan of the checkpointed round
        # output — not an extra join against the previous label table
        merged = (
            lab.select("n", "comp", F.col("comp").alias("own")).union(nb)
            .groupBy("n").agg(F.min("comp").alias("comp"),
                              F.min("own").alias("prev"))
        )
        # pointer jumping: comp values are themselves node ids, so one
        # self-join replaces comp with ITS current label — path halving.
        # (columns renamed rather than DataFrame-aliased: alias-based
        # self-join disambiguation fails to resolve over this plan shape)
        right = merged.select(F.col("n").alias("_rn"),
                              F.col("comp").alias("_rcomp"))
        new = (
            merged.join(right, merged["comp"] == right["_rn"], "left")
            .select(
                "n",
                F.coalesce("_rcomp", "comp").alias("comp"),
                "prev",
            )
            .localCheckpoint()
        )
        changed = new.where(F.col("comp") != F.col("prev")).count()
        lab = new.select("n", "comp")
        if changed == 0:
            return lab.select(F.col("n").alias("doc_id"),
                              F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc (Charikar 2002): sign of the per-bit sum of
    word-hash bits weighted by term frequency.

    Arrow-batched kernel, vectorized ACROSS the batch (round 3 — the
    per-doc Python loop was the slowest text kernel): tokenize with
    pandas str ops, flatten all docs' words with a doc index, ONE
    np.unique for the batch vocabulary (each distinct word md5-hashed
    once, cached across batches), ONE np.unique over packed
    (doc, word) keys for term frequencies, then per bit the signed sum
    is `2*bincount(doc, tf*bit) - bincount(doc, tf)` — no per-doc loop,
    no (pairs x bits) intermediate matrix.
    Tokenization is the ASCII regex [^a-z0-9]+ -> space over lowered text
    — deliberately expressible in any regex-capable oracle engine, so the
    fingerprints are bit-reproducible in the DuckDB contract oracle."""
    import re

    nonword = re.compile(r"[^a-z0-9]+")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab: dict[str, int] = {}

        def h(w: str) -> int:
            v = vocab.get(w)
            if v is None:
                v = h64_py(w)
                vocab[w] = v
            return v

        for pdf in batches:
            n_docs = len(pdf)
            if not n_docs:
                continue
            toks = (
                pdf["text"].fillna("").str.lower()
                .str.replace(nonword, " ", regex=True).str.split()
            )
            lens = toks.str.len().to_numpy(dtype=np.int64)
            fp = np.zeros(n_docs, dtype=np.uint64)
            nz = np.flatnonzero(lens > 0)
            if len(nz):
                flat = np.concatenate(
                    [toks.iat[i] for i in nz])  # '<U*' word array
                doc_idx = np.repeat(nz, lens[nz])
                uniq_words, inv = np.unique(flat, return_inverse=True)
                hv = np.fromiter(
                    (np.uint64(h(w)) for w in uniq_words.tolist()),
                    dtype=np.uint64, count=len(uniq_words))
                nv = np.int64(len(uniq_words))
                key = doc_idx * nv + inv  # doc-major packed (doc, word)
                pk, tf = np.unique(key, return_counts=True)
                dw_doc = pk // nv
                dw_tf = tf.astype(np.float64)
                wh = hv[pk % nv]
                # per doc: sum over words of tf * (+1 if bit else -1)
                #        = 2 * sum(tf where bit) - sum(tf)
                tot = np.bincount(dw_doc, weights=dw_tf, minlength=n_docs)
                for bpos in range(bits):
                    bit = ((wh >> np.uint64(bpos)) & np.uint64(1)
                           ).astype(np.float64)
                    pos = np.bincount(dw_doc, weights=dw_tf * bit,
                                      minlength=n_docs)
                    fp |= ((2.0 * pos - tot) > 0).astype(np.uint64) \
                        << np.uint64(bpos)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "simhash": fp.astype(np.int64),
            })

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        kern, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(
    fps: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by hamming distance <= max_hamming.

    Scale path: 16-bit band buckets (pigeonhole: any pair within hamming
    <= bands-1 shares at least one exact band) -> equi-join per band ->
    exact popcount(xor) filter.  bit_count is JVM-side."""
    banded = fps.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(
                F.lit(0xFFFF)).alias(f"b{b}")
            for b in range(bands)
        ])).alias("band_id", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    max_df: int = 1,
    delimiter: str = "\n",
    joiner: str = "\n",
    normalize: bool = True,
    broadcast_hot: bool = True,
) -> DataFrame:
    """MassiveText/CCNet-style line-level dedup: strip every line whose
    normalized form appears in MORE than ``max_df`` distinct documents
    (cross-document boilerplate: headers, footers, cookie banners,
    navigation).  The most common real-pipeline cleaning step between
    exact dedup (whole doc) and duplicated_spans (substring runs).

    Returns one row per input document: (doc_id, <text_col> cleaned,
    n_lines, n_removed).  Documents whose every line is boilerplate stay
    as rows with empty text — droppable downstream, never silently lost.

    Semantics: lines split on the ``delimiter`` REGEX, rebuilt with the
    ``joiner`` string; the DF count is over DISTINCT documents per
    normalized line (lower+trim when ``normalize``), so in-document
    repetition alone never marks a line hot; removal then strips ALL
    occurrences of hot lines; whitespace-only lines are never counted or
    stripped (they are structure, not boilerplate).

    Scale shape (100 TB): three equi-keyed exchanges — the distinct
    (hash, doc) pre-aggregation (map-side partial first, so a
    million-fold repeated banner contributes one row per doc to the
    shuffle), the DF count keyed on the 60-bit line hash, and the
    rebuild keyed on doc_id carrying the corpus text once.  The hot set is bounded by
    total_lines / max_df and is usually tiny (true boilerplate), so it
    broadcasts; pass broadcast_hot=False to force a shuffled join when
    a pathological corpus makes it large.  The projection barrier keeps
    Catalyst from inlining the split regex per line (the
    InferFiltersFromGenerate / CollapseProject HOF trap)."""
    if max_df < 1:
        raise ValueError(f"line_dedup: max_df must be >= 1, got {max_df}")
    other = [c for c in docs.columns if c != text_col]
    # coalesce NULL text to '': split(NULL) is NULL and posexplode(NULL)
    # yields zero rows — the doc would vanish from the output, breaking
    # the one-row-per-document contract
    staged = docs.select(
        *other,
        F.split(F.coalesce(F.col(text_col), F.lit("")),
                delimiter).alias("_ls"),
        F.rand(0).alias("_b1"))
    lines = staged.select(
        *other, F.posexplode("_ls").alias("_pos", "_line"))
    norm = F.lower(F.trim("_line")) if normalize else F.col("_line")
    lines = lines.withColumn("_h", h64(norm)).withColumn(
        "_blank", F.trim("_line") == "")
    # DF per normalized line over distinct docs: two-level partial agg
    hot = (
        lines.where(~F.col("_blank"))
        .select("doc_id", "_h").distinct()
        .groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_df)
        .select("_h", F.lit(True).alias("_hot"))
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    flagged = lines.join(hot, "_h", "left").withColumn(
        "_rm", F.coalesce("_hot", F.lit(False)) & ~F.col("_blank"))
    kept = F.array_sort(
        F.collect_list(F.when(~F.col("_rm"),
                              F.struct("_pos", F.col("_line")))))
    return (
        flagged.groupBy(*other)
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s["_line"]), joiner
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_rm").cast("int")).alias("n_removed"),
        )
    )


def select_survivors(
    components: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    quality_col: str = "quality",
    round_dp: int = 6,
) -> DataFrame:
    """Quality-aware canonical selection — the survivor step between
    `connected_components` and the actual drop: per duplicate group keep
    the HIGHEST-quality member (ties -> lowest id), flag the rest for
    removal.  Returns (id, component, quality, n_members, keep).

    Ranking is on the ROUNDED quality (the repo's cross-engine ranking
    contract) so a last-ulp score difference cannot flip the survivor
    between engines.  The join is LEFT on components: a group member
    missing from the quality frame (filtered corpus, partial scoring)
    keeps its row with NULL quality and ranks LAST — it can never win,
    but it is still flagged for removal and still counted in
    n_members, so 'drop where keep=false' removes it.  Scale shape:
    one equi-join on the id (components is only the docs that ARE in a
    duplicate group — a vanishing fraction of a healthy corpus) and one
    window partitioned by component (group-sized partitions, never
    corpus-sized); quality can be any per-doc frame (length, gopher
    score, LM perplexity...)."""
    from pyspark.sql.window import Window

    q = F.round(F.col(quality_col).cast("double"), round_dp)
    joined = components.join(
        quality.select(F.col(id_col), q.alias("_q")), id_col, "left")
    wc = Window.partitionBy(comp_col)
    rk = Window.partitionBy(comp_col).orderBy(
        F.desc_nulls_last("_q"), F.asc(id_col))
    return joined.select(
        id_col, comp_col,
        F.col("_q").alias(quality_col),
        F.count(F.lit(1)).over(wc).alias("n_members"),
        (F.row_number().over(rk) == 1).alias("keep"),
    )
