"""Input sources (SURVEY §2.1).

S1 CSV reader — reference `CsvFile(path, y_column).from_csv()`
(tsg_io/input.py:14-35): parse the Date column, project one value column,
keep FILE order (the reference never sorts).  S4 array source — reference
`TimeseriesArrayStream` (core/model.py:113-118).

S2 (sktime .ts) and S3 (XML financial reports) are not ported: sktime is
not installed (upstream hard dependency, tsg_io/input.py:3) and the XML
reader is out of the north rule's scope (SURVEY §2.1); the synthetic
generator (datagen.py) covers their fixture role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_series(
    spark: SparkSession,
    path: str,
    y_column: str,
    date_column: str = "Date",
    series_key: str | None = None,
) -> DataFrame:
    """CSV -> points frame (series_key, idx, ts, value), idx = file order
    (reference keeps file order, tsg_io/input.py:31-35; a csv read is
    order-stable per file, pinned here with an explicit per-file position).

    Column pruning pushes into the scan: only Date + y_column are read."""
    raw = (
        spark.read.option("header", True).csv(path)
        .select(
            F.to_timestamp(F.col(date_column)).alias("ts"),
            F.col(y_column).cast("double").alias("value"),
        )
        .withColumn("idx", F.monotonically_increasing_id())
    )
    key = series_key or f"{path}:{y_column}"
    return raw.select(
        F.lit(key).alias("series_key"), "idx", "ts", "value")


def series_from_array(
    spark: SparkSession, values, series_key: str = "array"
) -> DataFrame:
    """In-memory array -> series frame (reference TimeseriesArrayStream,
    core/model.py:113-118 — its deep copy is irrelevant here: DataFrames
    are immutable)."""
    return spark.createDataFrame(
        [(series_key, [float(v) for v in values])],
        "series_key string, values array<double>")
