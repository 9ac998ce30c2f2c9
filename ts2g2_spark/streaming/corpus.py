"""Streaming corpus ingest: the cleaning gates on a readStream.

The quality/lang/repetition gates are stateless projections
(plans/corpus.quality_gate — the IDENTICAL expression tree the batch
pipeline runs), so they apply to a document stream unchanged.  Exact
dedup is the only stateful piece: the batch anti-join (keep min doc_id)
becomes watermarked `dropDuplicates` on the content fingerprint —
state bounded by the horizon, survivor = FIRST ARRIVAL (the streaming
contract; the batch pipeline's min-doc_id survivor needs the whole
corpus, which a stream by definition never has)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts2g2_spark.plans.corpus import quality_gate
# re-exported: one drain helper (availableNow trigger, resume contract)
# for the whole streaming package
from ts2g2_spark.streaming.ingest import run_available_now  # noqa: F401

DOC_SCHEMA = ("doc_id long, text string, source string, "
              "ingest_ts timestamp")


def stream_docs(spark: SparkSession, path: str,
                schema: str = DOC_SCHEMA) -> DataFrame:
    """Document stream from a parquet directory (swap for Kafka/files
    in production — only this reader changes)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_clean(
    docs: DataFrame,
    min_words: int = 20,
    max_mean_word_len: float = 12.0,
    lang: str = "en",
    max_dup_2gram_frac: float | None = None,
    ts_col: str = "ingest_ts",
    dedup_horizon: str = "1 hour",
) -> DataFrame:
    """Gated + exact-deduped document stream.  Gates first (map-only,
    shrinks the stream before any state), then watermarked
    dropDuplicates on md5(text): duplicates within the horizon are
    suppressed across micro-batches; state for fingerprints older than
    the watermark is evicted — bounded memory at any stream length."""
    gated = quality_gate(docs, min_words, max_mean_word_len, lang,
                         max_dup_2gram_frac)
    # dropDuplicatesWithinWatermark, NOT plain dropDuplicates: only the
    # WithinWatermark variant evicts state for fingerprints older than
    # the horizon (a plain streaming dropDuplicates on a non-event-time
    # key grows state forever — see ingest.stream_dedup).  The trade:
    # a duplicate arriving later than the horizon is emitted again (the
    # batch dedup downstream remains the source of truth), and a doc
    # whose ingest_ts lags the watermark is dropped as late data.
    return (
        gated.select("*", F.md5("text").alias("content_hash"))
        .withWatermark(ts_col, dedup_horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
