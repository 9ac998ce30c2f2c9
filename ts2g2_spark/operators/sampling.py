"""Deterministic sampling and splitting for training-data pipelines.

RNG-free by design: membership = h64(salt + ":" + key) mod 1e6 <
fraction * 1e6.  This is what a 100 TB pipeline actually wants:
  * stable under retries, partition changes, and cluster resizes
    (`rand()`-based sampling is none of these — a re-executed task
    resamples);
  * reproducible in any engine with md5 (so the driver's DuckDB oracle
    replays the exact membership);
  * composable — the same (salt, key) always lands in the same bucket,
    so a doc's train/val assignment survives pipeline re-runs and
    incremental ingestion.
All expressions are JVM-side Catalyst (md5 + conv + pmod); the sample
predicate sits directly above the scan, so column pruning and filter
pipelining apply.

The trade vs `df.sample()`: the realized fraction is exact only in
expectation (hash buckets, not a countdown), +-O(1/sqrt(n)) — the same
property rand() sampling has, without its instability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts2g2_spark.functions.hashing import h64

_M = 1_000_000


def _thr(fraction: float) -> int:
    """fraction -> bucket threshold.  round(), not int(): truncation
    makes fractions whose float product lands just below an integer
    (0.29 * 1e6 = 289999.99999999994) one bucket stingier than the
    literal `fraction * 1e6` constant a hand-written SQL oracle uses —
    the engine and any literal-constant oracle must agree for ALL
    fractions, not just ones that multiply exactly."""
    return int(round(fraction * _M))


def _bucket(key_col: str, salt: str) -> F.Column:
    return F.pmod(
        h64(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(_M),
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic `fraction` sample keyed on key_col."""
    return df.where(_bucket(key_col, salt) < _thr(fraction))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language or
    per-source mixing weights for a training datamix).  Strata absent
    from `fractions` get default_fraction."""
    thr = F.lit(_thr(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_thr(frac))
        ).otherwise(thr)
    return df.where(_bucket(key_col, salt) < thr)


def split_assignment(
    df: DataFrame,
    val_fraction: float,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column ('val' iff the key's bucket falls under
    val_fraction, else 'train') — the assignment is a pure function of
    (salt, key), so it is stable across runs and incremental loads."""
    return df.withColumn(
        "split",
        F.when(_bucket(key_col, salt) < _thr(val_fraction),
               F.lit("val")).otherwise(F.lit("train")),
    )


def train_val_split(
    df: DataFrame,
    val_fraction: float,
    key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """(train, val) pair from split_assignment — disjoint and exhaustive
    by construction."""
    assigned = split_assignment(df, val_fraction, key_col, salt)
    return (
        assigned.where(F.col("split") == "train").drop("split"),
        assigned.where(F.col("split") == "val").drop("split"),
    )
