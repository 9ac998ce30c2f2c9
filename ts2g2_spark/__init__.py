"""ts2g2_spark — a from-scratch PySpark-native time-series rollup/downsample/
retention engine with ts2g2-parity graph analytics.

Everything here is built on public knowledge only: the PySpark DataFrame API,
the published visibility-graph / ordinal-partition / quantile-graph papers,
and the behavior of the public reference repo zangrcar/ts2g2 (cited by
file:line in docstrings; no code copied — the reference is a single-threaded
NetworkX library, this engine is DataFrame/Arrow-native).

Layout:
  session     - SparkSession factory tuned for the engine
  datagen     - deterministic tokenized-sequence input-table generator
  plans/      - points, rollup tiers, gap-fill, retention, lineage, pipeline
  functions/  - codecs (delta-of-delta, Gorilla XOR), hashing, text stats
  operators/  - ts->graph kernels (visibility/ordinal/quantile/proximity),
                linking joins, graph->ts generative kernels, dedup, ANN
  sources/    - readers (CSV with ts2g2 semantics, parquet/iceberg seam)
  streaming/  - Structured-Streaming-shaped ingestion seam
"""

__version__ = "0.1.0"
