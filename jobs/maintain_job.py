"""spark-submit entry point for incremental tier maintenance.

Catch-up style: each invocation drains everything currently available
from the input (availableNow trigger) and stops — schedule it
repeatedly, or swap the trigger in run_tier_maintenance for a
continuous service.  Folds a stream of point rows into a mergeable
tier table that absorbs arbitrarily late data
(streaming/ingest.incremental_tier_fold): each micro-batch
re-aggregates only the (series, bucket) groups it names, commits a new
snapshot version, and atomically advances the `_LATEST` pointer — the
at-least-once foreachBatch becomes exactly-once on the table, and a
restarted checkpoint lineage is refused loudly instead of
double-counting.

    bash scripts/package.sh     # builds dist/ts2g2_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/ts2g2_spark.zip \
        jobs/maintain_job.py \
        --input /path/of/point_parquet_stream \
        --table /path/to/tier_table_root \
        --checkpoint /path/to/stream_checkpoint \
        [--tier 1m] [--okey-col event_id] [--keep-versions 2]

One --table is bound to one --checkpoint lineage for its lifetime.
Serve the result via streaming/ingest.read_tier_snapshot (+
plans/rollup.finalize_state), or tier it up with rollup_tier_up.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(
        description="ts2g2_spark incremental tier maintenance")
    ap.add_argument("--input", required=True,
                    help="parquet dir streamed as point rows "
                         "(doc_id, source, ts, value)")
    ap.add_argument("--table", required=True,
                    help="tier table root (versioned snapshots + _LATEST)")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (bound to --table)")
    ap.add_argument("--tier", default="1m", choices=["1m", "1h", "1d"])
    ap.add_argument("--okey-col", default=None,
                    help="unique-per-point order column for exact "
                         "first/last (defaults to the raw timestamp)")
    ap.add_argument("--keep-versions", type=int, default=2)
    ap.add_argument("--n-parts", type=int, default=16,
                    help="series-hash partition count — size so a "
                         "typical batch touches a small fraction")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ts2g2_spark.streaming import ingest

    spark = SparkSession.builder.appName("tsg-tier-maintenance") \
        .getOrCreate()
    ingest.run_tier_maintenance(
        ingest.stream_points(spark, args.input),
        args.table, args.checkpoint,
        tier=args.tier, okey_col=args.okey_col,
        keep_versions=args.keep_versions, n_parts=args.n_parts)
    try:
        rows = ingest.read_tier_snapshot(spark, args.table).count()
    except FileNotFoundError:
        rows = 0  # no batch has ever committed (fresh table, no input)
    print(json.dumps({
        "table": args.table,
        "tier": args.tier,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
