"""Deterministic sampling/splitting operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from ts2g2_spark.operators import sampling

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_sized(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    s1 = {r.doc_id for r in sampling.hash_sample(docs, 0.3).collect()}
    s2 = {r.doc_id for r in sampling.hash_sample(docs, 0.3).collect()}
    assert s1 == s2  # pure function of (salt, key)
    assert 0.15 * n < len(s1) < 0.45 * n  # ~binomial around 0.3
    # monotone in fraction: smaller sample is a subset of larger
    s_small = {r.doc_id for r in sampling.hash_sample(docs, 0.1).collect()}
    assert s_small <= s1
    # different salt -> different (mostly disjoint-ish) membership
    s_other = {r.doc_id for r in
               sampling.hash_sample(docs, 0.3, salt="other").collect()}
    assert s_other != s1


def test_stratified_fractions(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sampling.stratified_hash_sample(
        docs, {"src0": 1.0, "src1": 0.0}, strata_col="source")
    srcs = {r.source for r in out.select("source").distinct().collect()}
    assert srcs == {"src0"}  # src1 and default strata fully dropped
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert out.count() == n_src0  # fraction 1.0 keeps everything


def test_train_val_split_partition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train, val = sampling.train_val_split(docs, 0.2)
    n, nt, nv = docs.count(), train.count(), val.count()
    assert nt + nv == n  # exhaustive
    ids_t = {r.doc_id for r in train.select("doc_id").collect()}
    ids_v = {r.doc_id for r in val.select("doc_id").collect()}
    assert not (ids_t & ids_v)  # disjoint
    # assignment is stable: recompute matches
    _, val2 = sampling.train_val_split(docs, 0.2)
    assert ids_v == {r.doc_id for r in val2.select("doc_id").collect()}
    # split column variant agrees
    a = sampling.split_assignment(docs, 0.2)
    assert a.where(F.col("split") == "val").count() == nv


def test_per_key_cap_deterministic_and_prefix_stable(spark):
    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    c10 = sampling.per_key_cap(docs_df, 10)
    a = {r.doc_id for r in c10.collect()}
    b = {r.doc_id for r in sampling.per_key_cap(docs_df, 10).collect()}
    assert a == b and len(a) > 0
    # per-group bound holds
    per = sampling.per_key_cap(docs_df, 10).groupBy("source").count()
    assert all(r["count"] <= 10 for r in per.collect())
    # resize-stable: kept(10) is a subset of kept(15)
    c15 = {r.doc_id for r in sampling.per_key_cap(docs_df, 15).collect()}
    assert a <= c15
    # different salt -> different choice (overwhelmingly)
    other = {r.doc_id
             for r in sampling.per_key_cap(docs_df, 10, salt="x").collect()}
    assert other != a
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        sampling.per_key_cap(docs_df, 0)
