"""Input sources (SURVEY §2.1).

S1 CSV reader — reference `CsvFile(path, y_column).from_csv()`
(tsg_io/input.py:14-35): parse the Date column, project one value column,
keep FILE order (the reference never sorts).  S4 array source — reference
`TimeseriesArrayStream` (core/model.py:113-118).

S2 sktime `.ts` reader — reference `TsFile(path).from_ts()`
(tsg_io/input.py:42-49: load_from_tsfile_to_dataframe, take dim_0 of the
FIRST case).  Re-implemented as a dependency-free parser: the @-header is
O(1) and read driver-side; the data lines parse distributed through
Catalyst split/transform expressions, so a many-case file scales with the
cluster.

S3 XML financial-report reader — reference
`FundamentalsReportFinancialStatements(path, item, season).from_xml()`
(tsg_io/input.py:61-100): finds `FinancialStatements/{Annual|Interim}
Periods`, collects the text of every `lineItem[@coaCode=item]` in
document order as floats.  One report file is KBs of XML — parsed
driver-side with xml.etree (stdlib), emitted as a points frame; a
directory of many reports would map this parser over paths with
`spark.read.format("binaryFile")` + mapInPandas, but the reference
surface is single-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def read_financial_xml(
    spark: SparkSession,
    path: str,
    item: str,
    season: str = "Annual",
    series_key: str | None = None,
) -> DataFrame:
    """S3: Reuters fundamentals XML -> series rows (series_key, idx,
    value), document order preserved (the reference returns a positional
    pd.Series, tsg_io/input.py:85-100).

    season: "Annual" -> AnnualPeriods, anything else -> InterimPeriods
    (the reference's exact lower() comparison)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    statements = root.find("FinancialStatements")
    if statements is None:
        raise ValueError(f"{path}: no FinancialStatements element")
    periods = statements.find(
        "AnnualPeriods" if season.lower() == "annual" else "InterimPeriods")
    if periods is None:
        raise ValueError(f"{path}: no periods element for season={season}")
    values = [float(el.text)
              for el in periods.findall(f".//lineItem[@coaCode = '{item}']")]
    key = series_key or f"{path}:{item}:{season}"
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(values)],
        "series_key string, idx long, value double")


def read_ts(spark: SparkSession, path: str) -> DataFrame:
    """sktime-format `.ts` reader (S2) without the sktime dependency.

    Output frame: (case_id long, dim string, label string|null,
    values array<double>) — one row per (case, dimension), dimensions
    named dim_0, dim_1, ... like load_from_tsfile_to_dataframe.

    Supported format surface (the sktime default used by the reference):
    `@`-prefixed header lines, `#` comments, `@data`, then one line per
    case with ':'-separated dimensions of comma-separated values and, when
    `@classLabel true ...`, the class label as the final ':'-field.
    Timestamped tuple values are not supported (the reference never reads
    them).

    Scale shape: the header scan stops at `@data` (O(header) driver-side);
    data lines parse via Catalyst split/transform (JVM, distributed).
    case_id is the file-order line number (a window over
    monotonically_increasing_id, which is ordered by file split for a
    single-file read).  SCALE NOTE: that window is an UNPARTITIONED
    Window.orderBy — a single-partition sort, acceptable only because a
    `.ts` benchmark file is one small text file by contract; a
    multi-gigabyte input would serialize through one task.  For bulk
    line-numbered ingestion use zipWithIndex-style per-split offsets
    instead."""
    has_label = False
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            if s.lower().startswith("@data"):
                break
            if s.lower().startswith("@classlabel"):
                parts = s.split()
                has_label = len(parts) > 1 and parts[1].lower() == "true"
    data = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"),
                F.monotonically_increasing_id().alias("_mid"))
        .where((F.length("line") > 0)
               & ~F.col("line").startswith("@")
               & ~F.col("line").startswith("#"))
        .withColumn("case_id",
                    F.row_number().over(Window.orderBy("_mid")) - 1)
    )
    parts = F.split("line", ":")
    if has_label:
        dims = F.expr("slice(split(line, ':'), 1, size(split(line, ':')) - 1)")
        label = F.element_at(parts, -1)
    else:
        dims = parts
        label = F.lit(None).cast("string")
    return (
        data.select(
            F.col("case_id").cast("long").alias("case_id"),
            label.alias("label"),
            F.posexplode(dims).alias("dim_idx", "raw"),
        )
        .select(
            "case_id",
            F.concat(F.lit("dim_"), F.col("dim_idx")).alias("dim"),
            "label",
            F.expr("transform(split(raw, ','), x -> cast(trim(x) as double))"
                   ).alias("values"),
        )
    )


def ts_first_series(spark: SparkSession, path: str) -> DataFrame:
    """Reference-exact S2 surface (tsg_io/input.py:47-49): dim_0 of the
    first case, as a series frame (series_key, values)."""
    return (
        read_ts(spark, path)
        .where((F.col("case_id") == 0) & (F.col("dim") == "dim_0"))
        .select(F.lit(f"{path}[0].dim_0").alias("series_key"), "values")
    )


def series_from_array(
    spark: SparkSession, values, series_key: str = "array"
) -> DataFrame:
    """In-memory array -> series frame (reference TimeseriesArrayStream,
    core/model.py:113-118 — its deep copy is irrelevant here: DataFrames
    are immutable)."""
    return spark.createDataFrame(
        [(series_key, [float(v) for v in values])],
        "series_key string, values array<double>")
