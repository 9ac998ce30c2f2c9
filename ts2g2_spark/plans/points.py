"""tokens -> points, plus skew handling.

The reference treats position as time (SURVEY §1.1: no timestamp arithmetic
anywhere — core/model.py indexes series positionally), so the engine maps
position idx -> timestamp as  base + idx * step  per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z (FIXTURES.md §1)


def explode_points(
    df: DataFrame,
    step_seconds: int = 1,
    base_epoch: int = BASE_EPOCH,
    positions_col: str | None = None,
) -> DataFrame:
    """tokens array -> one row per point: (doc_id, source, idx, ts, value).

    Pure Catalyst (posexplode + arithmetic), whole-stage-codegen'd, no UDF.
    When the input carries an explicit positions array (gap variant), idx is
    taken from it via arrays_zip.
    """
    if positions_col:
        z = df.select(
            "doc_id",
            "source",
            F.explode(F.arrays_zip(F.col(positions_col), F.col("tokens"))).alias("z"),
        )
        pts = z.select(
            "doc_id",
            "source",
            F.col(f"z.{positions_col}").cast("long").alias("idx"),
            F.col("z.tokens").alias("token"),
        )
    else:
        pts = df.select(
            "doc_id",
            "source",
            F.posexplode("tokens").alias("idx", "token"),
        ).withColumn("idx", F.col("idx").cast("long"))
    return pts.select(
        "doc_id",
        "source",
        "idx",
        F.timestamp_seconds(
            F.lit(base_epoch) + F.col("idx") * F.lit(step_seconds)
        ).alias("ts"),
        F.col("token").cast("double").alias("value"),
    )


def salted_repartition(
    df: DataFrame, num_partitions: int | None = None, buckets: int = 64
) -> DataFrame:
    """Explicit hot-key handling (north rule): sources are Zipf-distributed,
    so partitioning by source alone would melt one executor.  Salt with
    pmod(hash(doc_id), buckets): a hot source spreads over `buckets`
    partitions while each doc stays whole (per-series kernels need the whole
    row anyway — rows are doc-atomic, so this is a pure balance move).

    AQE fixes skewed JOINs at runtime but not skewed grouped-UDF stages;
    this is the explicit pre-shuffle for those."""
    salt = F.pmod(F.hash("doc_id"), F.lit(buckets))
    if num_partitions:
        return df.repartition(num_partitions, F.col("source"), salt)
    return df.repartition(F.col("source"), salt)
