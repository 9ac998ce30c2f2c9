"""Measured evidence that salted repartitioning fixes hot-source skew.

North rule: "salted repartitioning on (source, doc_id bucket) handles
hot-source skew at 10^12-sequence scale".  This harness demonstrates the
mechanism on a grouped-kernel stage — the stage class AQE can NOT fix
(AQE splits skewed JOIN partitions; a skewed `repartition(source)` feeding
a mapInPandas kernel stays skewed).

Workload: Zipf-skewed tokenized docs (datagen defaults: hottest source
owns ~a third of all docs) -> repartition -> per-doc Arrow kernel
(per-series rollup, plans/rollup.rollup_from_tokens's kernel path).
Compared partitionings, same data, same kernel, same partition COUNT:

  * by-source        — `repartition(P, source)`: every doc of a source
                       lands in one partition; the hot source serializes
                       on one core (the naive layout).
  * salted           — `plans.points.salted_repartition(P)`: (source,
                       pmod(hash(doc_id), 64)); docs stay whole, hot
                       sources spread.

Reports wall seconds and the max/mean partition-row ratio (the skew
factor the executors actually see).  Writes BENCH/SKEW.md.

Run: python BENCH/skew.py   (env: SKEW_DOCS, default 120000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def partition_rows(df):
    from pyspark.sql import functions as F

    return [
        r.cnt for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]


def main() -> None:
    from pyspark.sql import functions as F

    from ts2g2_spark import datagen
    from ts2g2_spark.plans import rollup as R
    from ts2g2_spark.plans.points import salted_repartition
    from ts2g2_spark.session import get_spark

    n_docs = int(os.environ.get("SKEW_DOCS", "120000"))
    cpus = 32
    spark = get_spark(app_name="skew_bench", parallelism=cpus,
                      shuffle_partitions=cpus)
    toks = datagen.tokenized_sequences(spark, n_docs, seed=7)
    toks = toks.localCheckpoint()  # exclude datagen from the measurement

    by_source = toks.repartition(cpus, F.col("source"))
    salted = salted_repartition(toks, num_partitions=cpus)

    def run(df) -> float:
        t0 = time.time()
        R.rollup_from_tokens(df, tier="1m", gapfill=True).write.format(
            "noop").mode("overwrite").save()
        return time.time() - t0

    results = {}
    # interleave 3 pairs; report per-variant median (host drift)
    for variant, df in (("by_source", by_source), ("salted", salted)):
        rows = partition_rows(df)
        results[variant] = {
            "partitions": len(rows),
            "max_rows": max(rows),
            "mean_rows": round(sum(rows) / len(rows), 1),
            "skew_factor": round(max(rows) / (sum(rows) / len(rows)), 2),
            "walls": [],
        }
    for _ in range(3):
        for variant, df in (("by_source", by_source), ("salted", salted)):
            results[variant]["walls"].append(round(run(df), 3))
    for v in results.values():
        v["wall_s"] = sorted(v["walls"])[1]  # median of 3

    speedup = results["by_source"]["wall_s"] / results["salted"]["wall_s"]
    out = {"n_docs": n_docs, "cpus": cpus, "speedup": round(speedup, 2),
           **results}
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(f"""# BENCH/SKEW.md — salted repartition vs hot-source skew

Grouped-kernel stage (per-doc 1m rollup kernel, gap-filled) over
{n_docs:,} Zipf-skewed docs at local[{cpus}], {cpus} partitions both
ways.  AQE cannot fix this stage class (it is not a join); the salt is
the explicit pre-shuffle.  Median of 3 interleaved runs:

| layout | max partition rows | mean | skew factor | wall s |
|---|---|---|---|---|
| repartition(source) | {results['by_source']['max_rows']:,} | {results['by_source']['mean_rows']:,} | {results['by_source']['skew_factor']}x | {results['by_source']['wall_s']} |
| salted (source, pmod(hash(doc_id),64)) | {results['salted']['max_rows']:,} | {results['salted']['mean_rows']:,} | {results['salted']['skew_factor']}x | {results['salted']['wall_s']} |

**Speedup from salting: {speedup:.2f}x** — the by-source layout
serializes the hottest source on one core, so its wall clock is bounded
below by (hot-source rows / one core's throughput) regardless of
cluster size; the salted layout's bound shrinks with cores.  At 10^12
sequences the same salt keeps every partition near the mean while each
doc stays whole for the per-series kernels.

Reproduce: `python BENCH/skew.py` (env: SKEW_DOCS).
""")


if __name__ == "__main__":
    main()
