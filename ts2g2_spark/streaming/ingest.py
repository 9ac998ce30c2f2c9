"""Structured-Streaming ingestion seam (SURVEY §2.7).

The reference has no streaming at all (its `TimeseriesStream` is a naming
artifact — core/model.py:109-118 deep-copies a whole in-memory array).
The engine keeps the 1m tier buildable as a STREAM: file-source ->
watermark -> windowed aggregate -> availableNow batch trigger, so the same
continuous-aggregate tables can be fed incrementally on a cluster (late
data bounded by the watermark) while v1 production runs use the batch
pipeline (plans/pipeline.py).

first/last are omitted in the streaming tier: they need min_by/max_by over
an event-order key, which Spark's streaming aggregation supports only via
a stateful flatMapGroupsWithState — kept out of v1 (the batch path is the
source of truth; the streaming tier carries cnt/sum/min/max, which are the
inputs tier-ups need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTS_SCHEMA = ("doc_id string, source string, ts timestamp, value double")


def stream_points(
    spark: SparkSession, input_dir: str, max_files: int = 64
) -> DataFrame:
    """File-source stream of point rows (a real deployment would swap in
    Kafka/Iceberg incremental scan here — the transformations downstream
    are identical)."""
    return (
        spark.readStream.schema(POINTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def streaming_rollup_1m(
    points: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming 1m tier: watermarked tumbling-window aggregate.  Output
    schema matches the batch tier (minus first/last, see module note) so
    `rollup_tier_up` composes on top."""
    return (
        points.withWatermark("ts", watermark)
        .groupBy("doc_id", "source", F.window("ts", "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .select(
            "doc_id", "source",
            F.col("window.start").alias("bucket_ts"),
            "cnt", "sum", "min", "max",
            F.lit(False).alias("gapfilled"),
        )
    )


def run_available_now(
    tier: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available and stop — the batch-shaped
    trigger the engine uses for incremental catch-up runs; the checkpoint
    dir carries streaming state across runs (resume contract)."""
    q = (
        tier.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
