"""End-to-end rollup pipeline with checkpoint/resume + lineage.

Stage DAG (each stage commits its output + manifest before the next runs —
the checkpoint granularity of the north rule):

  input (tokenized_sequences)
    -> salted repartition                 [explicit skew handling]
    -> rollup_1m  (map-only array kernel, gap-filled)
    -> rollup_1h  (tier-from-tier continuous aggregate)
    -> rollup_1d  (tier-from-tier)
    -> chunks     (delta-of-delta + Gorilla, map-only)
    -> retention  (partition-predicate drop per tier)
  every stage appends per-partition lineage rows.

Resume: a stage whose manifest matches the input fingerprint is skipped and
its table is read back instead of recomputed; re-running a killed job
produces identical tables with no duplicates (overwrite + atomic manifest).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts2g2_spark.catalog import Catalog
from ts2g2_spark.plans import chunks as chunks_mod
from ts2g2_spark.plans import rollup as rollup_mod
from ts2g2_spark.plans.lineage import partition_metrics
from ts2g2_spark.plans.points import salted_repartition


def _fingerprint(desc: str) -> str:
    import hashlib

    return hashlib.md5(desc.encode()).hexdigest()


class StagedPipeline:
    """Checkpoint/resume + lineage base shared by the rollup and corpus
    pipelines: each stage commits its output table and an atomic
    manifest before the next stage runs; on re-submit, a stage whose
    manifest matches the input fingerprint is read back instead of
    recomputed (idempotent resume from the last committed stage)."""

    def __init__(self, spark: SparkSession, catalog_root: str,
                 run_id: str | None = None):
        self.spark = spark
        self.cat = Catalog(catalog_root, spark)
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.stage_log: list[dict] = []

    def _run_stage(self, stage: str, fingerprint: str, build,
                   partition_by: list[str] | None = None,
                   force: bool = False) -> DataFrame:
        if not force and self.cat.committed(stage, fingerprint):
            self.stage_log.append({"stage": stage, "skipped": True})
            return self.cat.read(stage)
        t0 = time.time()
        df = build()
        self.cat.write(df, stage, partition_by=partition_by)
        wall_ms = (time.time() - t0) * 1000
        out = self.cat.read(stage)
        lin = partition_metrics(out, self.run_id, stage, fingerprint, wall_ms)
        lin.write.mode("append").parquet(self.cat.table_path("lineage"))
        self.cat.commit(stage, fingerprint,
                        {"wall_ms": wall_ms, "run_id": self.run_id})
        self.stage_log.append(
            {"stage": stage, "skipped": False, "wall_ms": wall_ms})
        return out


class RollupPipeline(StagedPipeline):
    def __init__(self, spark: SparkSession, catalog_root: str,
                 run_id: str | None = None, salt_buckets: int = 64,
                 gapfill: bool = True, positions_col: str | None = None,
                 step_seconds: int = 1):
        super().__init__(spark, catalog_root, run_id)
        self.salt_buckets = salt_buckets
        self.gapfill = gapfill
        self.positions_col = positions_col
        self.step_seconds = step_seconds

    def run(self, input_df: DataFrame, input_desc: str,
            stop_after: str | None = None) -> dict[str, DataFrame]:
        """Run (or resume) the full pipeline. stop_after simulates a kill
        between stage commits for resume tests."""
        fp = _fingerprint(
            f"{input_desc}|salt={self.salt_buckets}|gap={self.gapfill}"
            f"|step={self.step_seconds}")
        out: dict[str, DataFrame] = {}

        salted = salted_repartition(input_df, buckets=self.salt_buckets)

        out["rollup_1m"] = self._run_stage(
            "rollup_1m", fp,
            lambda: rollup_mod.rollup_from_tokens(
                salted, tier="1m", step_seconds=self.step_seconds,
                gapfill=self.gapfill, positions_col=self.positions_col),
            partition_by=None)
        if stop_after == "rollup_1m":
            return out
        out["rollup_1h"] = self._run_stage(
            "rollup_1h", fp,
            lambda: rollup_mod.rollup_tier_up(out["rollup_1m"], "1h"))
        if stop_after == "rollup_1h":
            return out
        out["rollup_1d"] = self._run_stage(
            "rollup_1d", fp,
            lambda: rollup_mod.rollup_tier_up(out["rollup_1h"], "1d"))
        if stop_after == "rollup_1d":
            return out
        out["chunks"] = self._run_stage(
            "chunks", fp,
            lambda: chunks_mod.compress_chunks(
                salted, step_seconds=self.step_seconds,
                positions_col=self.positions_col))
        out["lineage"] = self.spark.read.parquet(
            self.cat.table_path("lineage"))
        return out

    def retention(self, now_epoch: int,
                  horizons: dict[str, int] = rollup_mod.DEFAULT_RETENTION,
                  ) -> dict[str, DataFrame]:
        """Apply tier-scoped retention, rewriting each tier table filtered
        by its horizon (with Iceberg: a partition-predicate DELETE)."""
        out = {}
        for tier in ("1m", "1h", "1d"):
            name = f"rollup_{tier}"
            df = self.cat.read(name)
            kept = rollup_mod.apply_retention(df, tier, now_epoch, horizons)
            kept_cached = kept.localCheckpoint() if kept.isStreaming is False \
                else kept
            self.cat.write(kept_cached, name)
            out[name] = self.cat.read(name)
        return out
