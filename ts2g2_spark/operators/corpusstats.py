"""Corpus-level vocabulary and length statistics — the "corpus health"
reports a training-data pipeline runs per source before mixing: Zipf /
Heaps vocabulary statistics (vocab size, hapax ratio, type-token ratio,
top-rank share, fitted Zipf slope) and document-length profiles.

Scale shapes (pure Catalyst):
  * vocab_stats: the word stream is the classic wordcount shuffle —
    explode -> partial-agg'd groupBy (source, word); per-source scalars
    are a second partial agg of that (source, word, tf) frame.  The
    top-R ranking for the Zipf fit is an EXACT two-level tournament:
    rank inside (source, hash-bucket) first (bounded partitions even
    when one source owns the whole corpus vocabulary), keep R per
    bucket, then rank the <= R*buckets survivors per source — the
    global top-R is always a subset of the per-bucket top-Rs.  No
    single-partition sort over a full vocabulary anywhere.
  * corpus_length_profile: one hash aggregate; exact continuous
    percentiles hold one source's lengths in the sort-based aggregate —
    swap `F.percentile` for `percentile_approx` at extreme scale (same
    call shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ts2g2_spark.operators.text import _norm_words


def exact_topk(
    df: DataFrame,
    order_col: str,
    k: int,
    tie_col: str,
    group_cols: tuple[str, ...] = (),
    buckets: int = 64,
    rank_name: str = "rank",
) -> DataFrame:
    """Exact distributed top-k per group by (order_col DESC, tie_col
    ASC) — the bucket tournament shared by vocab_stats and the CMS
    hot-words query: rows first rank inside `buckets` hash partitions
    of the tie key (bounding every window partition), then the global
    per-group rank sees at most k * buckets candidate rows instead of
    the whole input.  Exact because any true global top-k row is also
    top-k within its bucket.  Deterministic total order via the tie
    column.  Output: input columns + `rank_name`, rows with rank <= k.
    """
    if k < 1 or buckets < 1:
        raise ValueError(f"exact_topk: need k >= 1, buckets >= 1, "
                         f"got {k=} {buckets=}")
    bucketed = df.withColumn(
        "_b", F.pmod(F.xxhash64(tie_col), F.lit(buckets)))
    w_bucket = Window.partitionBy(*group_cols, "_b") \
        .orderBy(F.desc(order_col), F.asc(tie_col))
    cand = bucketed.withColumn("_r", F.row_number().over(w_bucket)) \
        .where(F.col("_r") <= k)
    w_g = Window.partitionBy(*group_cols) \
        .orderBy(F.desc(order_col), F.asc(tie_col))
    return (
        cand.withColumn(rank_name, F.row_number().over(w_g))
        .where(F.col(rank_name) <= k)
        .drop("_b", "_r")
    )


def vocab_stats(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    top_r: int = 100,
    buckets: int = 64,
) -> DataFrame:
    """Per-source vocabulary statistics over the normalized word stream
    (lowercase, punctuation stripped — functions/hashing.normalize_text,
    the same stream tfidf/top_ngrams use):

      n_tokens      total word occurrences
      vocab         distinct words
      hapax         words occurring exactly once
      ttr           type-token ratio vocab/n_tokens
      hapax_ratio   hapax/vocab
      top1_share    most frequent word's share of n_tokens
      zipf_slope    OLS slope of ln(freq) vs ln(rank) over the top
                    `top_r` words (ties ranked by (freq desc, word)) —
                    ~-1 for natural text (Zipf's law), flatter for
                    templated/boilerplate corpora

    Ratios rounded to 6 decimals.  Sources whose documents normalize to
    zero words produce no row.  NULL zipf_slope when a source has a
    single distinct word (degenerate regression).
    """
    if top_r < 2 or buckets < 1:
        raise ValueError("top_r must be >= 2 and buckets >= 1")
    words = docs.select(
        F.col(source_col).alias("source"),
        F.explode(_norm_words(text_col)).alias("word"),
    )
    tf = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("tf"))
    per_source = tf.groupBy("source").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
        .cast("long").alias("hapax"),
    )
    # exact top-R tournament: bucket ranks bound partition size, the
    # final per-source rank sees at most top_r*buckets rows
    ranked = exact_topk(
        tf, "tf", top_r, "word", group_cols=("source",), buckets=buckets)
    slope = ranked.groupBy("source").agg(
        F.round(F.regr_slope(F.log("tf"), F.log("rank")), 6)
        .alias("zipf_slope"),
        F.max(F.when(F.col("rank") == 1, F.col("tf"))).alias("_top1"),
    )
    return per_source.join(F.broadcast(slope), "source").select(
        "source", "n_tokens", "vocab", "hapax",
        F.round(F.col("vocab") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("hapax") / F.col("vocab"), 6).alias("hapax_ratio"),
        F.round(F.col("_top1") / F.col("n_tokens"), 6).alias("top1_share"),
        "zipf_slope",
    )


def corpus_length_profile(
    docs: DataFrame,
    source_col: str = "source",
    len_col: str = "n_chars",
    short_chars: int = 200,
) -> DataFrame:
    """Per-source document-length profile: doc count, total/mean chars,
    exact continuous percentiles (p10/p25/p50/p75/p90), and the fraction
    of short documents (< `short_chars` chars).  Rounded to 6 decimals.
    One partial-agg'd hash aggregate."""
    ln = F.col(len_col)
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ln).alias("total_chars"),
        F.round(F.avg(ln), 6).alias("mean_chars"),
        F.percentile(ln, F.lit([0.1, 0.25, 0.5, 0.75, 0.9])).alias("_q"),
        F.round(F.avg(F.when(ln < short_chars, 1).otherwise(0)), 6)
        .alias("short_frac"),
    ).select(
        "source", "n_docs", "total_chars", "mean_chars",
        F.round(F.col("_q")[0], 6).alias("p10"),
        F.round(F.col("_q")[1], 6).alias("p25"),
        F.round(F.col("_q")[2], 6).alias("p50"),
        F.round(F.col("_q")[3], 6).alias("p75"),
        F.round(F.col("_q")[4], 6).alias("p90"),
        "short_frac",
    )


def source_divergence(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Per-source token-distribution divergence from the whole corpus —
    the datamix diagnostic behind domain-weighting decisions: KL(source
    || corpus) in bits over the normalized word stream, plus the
    sizes the divergence is conditioned on.

      n_tokens   source word occurrences
      n_types    distinct words in the source
      kl_bits    sum_w p_s(w) * log2(p_s(w) / p_c(w)) — 0 for a source
                 that mirrors the corpus mixture, growing as its
                 vocabulary usage diverges.  No smoothing is needed:
                 the sum ranges over words PRESENT in the source
                 (p_s > 0), and every such word has corpus mass.

    Scale shape: one wordcount shuffle keyed (source, word); corpus
    totals re-aggregate that frame (never re-reading text); the
    word-level join is corpus-vocab-bounded, then one per-source
    partial agg.  KL is computed as
    (sum c_sw * ln(c_sw / c_w) ) / n_s / ln 2 + log2(N / n_s)
    restated with only integer counts inside the log — the identical
    expression tree any SQL engine replays; rounded (+0.0) so the
    -0.0 a single-source corpus hits is canonical."""
    import math

    words = docs.select(
        F.col(source_col).alias("source"),
        F.explode(_norm_words(text_col)).alias("w"),
    )
    sw = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c_sw"))
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    totals = sw.groupBy("source").agg(
        F.sum("c_sw").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"))
    n_corpus = F.sum("n_tokens").over(Window.partitionBy())
    joined = (
        sw.join(cw, "w")
        .groupBy("source")
        .agg(F.sum(F.col("c_sw")
                   * F.log(F.col("c_sw") / F.col("c_w"))).alias("_sl"))
    )
    return (
        totals.withColumn("_n", n_corpus)
        .join(joined, "source")
        .select(
            "source", "n_tokens", "n_types",
            (
                F.round(
                    (F.col("_sl") / F.col("n_tokens")
                     + F.log(F.col("_n") / F.col("n_tokens")))
                    / F.lit(math.log(2.0)),
                    round_dp,
                ) + F.lit(0.0)
            ).alias("kl_bits"),
        )
    )


def heaps_law(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    round_dp: int = 6,
    cache: bool = True,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) = K * n^beta, where n
    is the cumulative token count and V the cumulative distinct-word
    count over documents in ascending ``id_col`` order (the
    deterministic corpus order).  Returns ONE row
    (n_docs, n_tokens, vocab, heaps_k, heaps_beta, r2), rounded;
    beta ~ 0.4-0.6 for natural text, near 0 for closed templated
    vocabularies — a corpus-health signal alongside zipf_slope.

    Scale shape — no global window anywhere: the growth curve needs a
    corpus-order prefix sum, computed as the classic TWO-PASS
    distributed scan over one doc-sized frame:

      1. per-doc partials: (doc, toks, new_words) where new_words
         counts the words whose FIRST document (min id) is this doc —
         one (word -> min id) aggregate, never a per-prefix distinct;
      2. range-bucket by id percentile (ntile over the doc frame is
         avoided too: bucket = dense integer from a percentile-free
         uniform split of the id domain), cumsum WITHIN each bucket
         partition, then add each bucket's broadcast offset (the
         exclusive prefix over <= n_buckets partial sums).

    The OLS fit of ln V on ln n runs over closed-form sums (one
    partial-aggregated pass); prefix rows before the first token
    (cum_tokens = 0) are excluded from the fit.  NULL fit columns when
    fewer than two distinct ln(n) values exist."""
    if n_buckets < 1:
        raise ValueError("heaps_law: n_buckets must be >= 1")
    staged = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        _norm_words(text_col).alias("_ws"),
        F.rand(0).alias("_bar"))
    per_doc = staged.select("_id", F.explode_outer("_ws").alias("word"))
    toks = per_doc.groupBy("_id").agg(
        F.sum(F.when(F.col("word").isNotNull(), 1).otherwise(0))
        .alias("toks"))
    firsts = (
        per_doc.where(F.col("word").isNotNull())
        .groupBy("word").agg(F.min("_id").alias("_id"))
        .groupBy("_id").agg(F.count(F.lit(1)).alias("new_words"))
    )
    # cache the doc-sized partials frame: it feeds the id-domain agg,
    # the bucketed cumsum AND the bucket totals — uncached, each
    # consumer re-runs the corpus tokenize+explode (the lazy-reuse
    # re-scan trap; 7 source scans observed, 2 after)
    per = toks.join(firsts, "_id", "left").select(
        "_id", "toks", F.coalesce("new_words", F.lit(0)).alias("nw"))
    if cache:
        # doc-sized; pinned until unpersist — cache=False trades one
        # extra tokenize scan per consumer for zero storage footprint
        per = per.cache()
    # range buckets from the id domain (one tiny agg, broadcast)
    dom = per.agg(F.min("_id").alias("lo"), F.max("_id").alias("hi"))
    per = per.crossJoin(F.broadcast(dom)).withColumn(
        "_b",
        # subtract AFTER the double cast: an id domain spanning most of
        # int64 (signed snowflake ids at both extremes) overflows the
        # long subtraction itself, not just the * n_buckets product;
        # floor of a monotone double ratio keeps bucket order aligned
        # with id order either way
        F.least(
            F.lit(n_buckets - 1),
            ((F.col("_id").cast("double") - F.col("lo").cast("double"))
             * n_buckets
             / (F.col("hi").cast("double") - F.col("lo").cast("double")
                + 1.0))
            .cast("long")),
    )
    wb = (Window.partitionBy("_b").orderBy("_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    within = per.select(
        "_id", "_b",
        F.sum("toks").over(wb).alias("ct_in"),
        F.sum("nw").over(wb).alias("cv_in"))
    btot = per.groupBy("_b").agg(
        F.sum("toks").alias("bt"), F.sum("nw").alias("bv"))
    woff = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1)  # <= n_buckets rows: safe window
    offs = btot.select(
        "_b",
        F.coalesce(F.sum("bt").over(woff), F.lit(0)).alias("ot"),
        F.coalesce(F.sum("bv").over(woff), F.lit(0)).alias("ov"))
    curve = (
        within.join(F.broadcast(offs), "_b")
        .select(
            "_id",
            (F.col("ct_in") + F.col("ot")).alias("cum_tokens"),
            (F.col("cv_in") + F.col("ov")).alias("cum_vocab"))
        .where(F.col("cum_tokens") > 0)
    )
    x = F.log(F.col("cum_tokens").cast("double"))
    y = F.log(F.col("cum_vocab").cast("double"))
    sums = curve.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.countDistinct(F.col("cum_tokens")).alias("nx"),
        F.max("cum_tokens").alias("n_tokens"),
        F.max("cum_vocab").alias("vocab"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    m = F.col("m").cast("double")
    varx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = m * F.col("syy") - F.col("sy") * F.col("sy")
    cov = m * F.col("sxy") - F.col("sx") * F.col("sy")
    beta = cov / varx
    intercept = (F.col("sy") - beta * F.col("sx")) / m
    r2 = (cov * cov) / (varx * vary)
    ok = F.col("nx") >= 2
    return sums.crossJoin(F.broadcast(n_docs)).select(
        "n_docs", "n_tokens", "vocab",
        (F.when(ok, F.round(F.exp(intercept), round_dp))
         + F.lit(0.0)).alias("heaps_k"),
        (F.when(ok, F.round(beta, round_dp)) + F.lit(0.0))
        .alias("heaps_beta"),
        (F.when(ok & (vary > 0), F.round(r2, round_dp)) + F.lit(0.0))
        .alias("r2"),
    )


def auc_score(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """ROC AUC of a score against a binary label via the Mann-Whitney
    rank-sum identity — the standard one-number eval of a quality /
    toxicity / contamination classifier against gold labels before it
    gates a corpus.  AUC = P(score_pos > score_neg) + P(equal)/2, with
    ties handled exactly through average ranks:

        AUC = (sum of avg ranks of positives - n_pos(n_pos+1)/2)
              / (n_pos * n_neg)

    Output per group: (group cols, n_pos, n_neg, auc); auc is NULL when
    either class is empty (undefined).

    Scale shape: rows collapse FIRST to one row per (group, distinct
    score) with (count, positive count) in a fully-parallel partial
    agg; the ordered cumulative then runs over that bounded frame, and
    the rank-sum identity needs only per-distinct-score average ranks
    (cum-before + (n+1)/2) — no per-row global sort ever happens.  The
    ordered window is per GROUP over distinct scores: bounded for
    quantized/rounded scores (this repo's score columns round to
    round_dp by contract); for a truly continuous score at extreme
    scale, quantize it first (F.round) — that redefines ties at the
    quantization step, exactly like ranking on the rounded cosine in
    similarity.py.

    Determinism: the whole rank sum is carried in HALF-RANK units so it
    stays int64 end to end — `_r2 = 2*cum_before + n + 1` is twice the
    average rank (always an integer), and
    AUC = (sum(pos * _r2) - n_pos*(n_pos+1)) / (2 * n_pos * n_neg).
    Integer addition is order-independent, so the value is engine-exact
    (no float summation-order drift) up to ~1e9 rows per group
    (2*n_pos*N < 2^63), and a DuckDB oracle replays the value hash."""
    g = list(group_cols)
    per = (
        scored.groupBy(*g, F.col(score_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum(F.col(label_col).cast("long")).alias("_p"))
    )
    w = (Window.partitionBy(*g).orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    rank2 = (F.lit(2) * F.coalesce(F.sum("_n").over(w), F.lit(0))
             + F.col("_n") + F.lit(1))
    agg = (
        per.select(*g, "_n", "_p", rank2.alias("_r2"))
        .groupBy(*g)
        .agg(F.sum(F.col("_p") * F.col("_r2")).alias("_rs2"),
             F.sum("_p").alias("n_pos"),
             F.sum(F.col("_n") - F.col("_p")).alias("n_neg"))
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    auc = ((F.col("_rs2") - np_ * (np_ + 1)).cast("double")
           / (F.lit(2.0) * np_ * nn))
    return agg.select(
        *g, "n_pos", "n_neg",
        F.when((np_ > 0) & (nn > 0), F.round(auc, round_dp))
        .alias("auc"),
    )
