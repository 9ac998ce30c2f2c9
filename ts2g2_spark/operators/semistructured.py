"""Semi-structured (schema-on-read) operators over JSON payload columns.

Every real event stream carries a `props`-style JSON column; at 100 TB
the two operations that matter are (a) discovering what is actually in
it (key census: which keys, how often, what types, how many distinct
values — the schema-inference pass that decides what to promote to real
columns) and (b) promoting chosen fields to typed columns feeding the
rollup tiers (map-only extraction, no Python).

Cross-engine replay contract: Spark's `from_json(col,
'map<string,string>')` yields (key, raw-scalar-text) pairs — numbers as
their literal text ("69"), strings unquoted, JSON null as SQL NULL —
exactly what DuckDB's `json_keys` + `json_extract_string` produce, so
the census is value-hash oracle-able.  Malformed JSON and non-object
payloads drop out identically on both sides (Spark parses them to a
NULL map, DuckDB `json_keys` returns an empty list).  The raw-text
equivalence is exact for SCALAR values; nested objects/arrays come back
as compact JSON text whose formatting is engine-specific — census
counts of nested values are still correct, but don't hash their text
across engines.

No reference counterpart (the ts2g2 reference has no semi-structured
surface); engine-native family like the rollup/gap-fill tiers
(SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# integer / numeric literal shapes, anchored; identical semantics in
# Java regex (Spark rlike) and RE2 (DuckDB regexp_full_match)
JSON_INT_RE = r"-?[0-9]+"
JSON_NUM_RE = r"-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?"


def json_kv_pairs(
    df: DataFrame,
    json_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (group_cols..., key, value-as-raw-text) for every
    key of every well-formed JSON OBJECT row.  Map-only (parse +
    generate, zero exchanges); malformed / non-object / NULL payloads
    contribute nothing."""
    m = F.from_json(F.col(json_col), "map<string,string>")
    return (
        df.select(*[F.col(c) for c in group_cols], m.alias("_m"))
        .select(*[F.col(c) for c in group_cols],
                F.explode("_m").alias("key", "value"))
    )


def json_key_census(
    df: DataFrame,
    json_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Schema-inference census of a JSON payload column.  Output per
    (group_cols..., key): n (rows carrying the key), n_null (JSON
    nulls), n_distinct (distinct raw values, NULLs excluded), n_int /
    n_num (values whose text is an integer / numeric literal — the
    promote-to-BIGINT/DOUBLE signal).

    Scale shape: map-only pair generation then ONE hash aggregate on
    (group, key) with map-side combine; the frame is bounded by the
    live key vocabulary per group, never the row count.  All-integer
    output — no rounding contract."""
    pairs = json_kv_pairs(df, json_col, group_cols)
    v = F.col("value")
    return (
        pairs.groupBy(*group_cols, "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v.isNull().cast("long")).alias("n_null"),
            F.countDistinct(v).alias("n_distinct"),
            # isNotNull conjunct: rlike(NULL) is NULL and would poison
            # the sum for keys whose every value is a JSON null
            F.sum((v.isNotNull() & v.rlike(f"^{JSON_INT_RE}$"))
                  .cast("long")).alias("n_int"),
            F.sum((v.isNotNull() & v.rlike(f"^{JSON_NUM_RE}$"))
                  .cast("long")).alias("n_num"),
        )
    )


def json_extract_typed(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Promote JSON fields to typed columns: `fields` maps output name
    -> (json path like '$.k', Spark type DDL).  Map-only projection
    (`get_json_object` + try_cast, whole-stage codegen, zero Python /
    zero exchanges) — the schema-on-read to real-column step that lets
    everything downstream (rollups, tiers, sketches) run on typed data.
    try_cast: untypeable text yields NULL instead of failing the job
    under ANSI mode (DuckDB twin: `try_cast(json_extract_string(...))`).
    """
    if not fields:
        raise ValueError("json_extract_typed: need at least one field")
    cols: list[Column] = [F.col(c) for c in keep_cols]
    for name, (path, dtype) in fields.items():
        cols.append(
            F.get_json_object(F.col(json_col), path).try_cast(dtype)
            .alias(name))
    return df.select(*cols)
