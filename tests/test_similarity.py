"""ANN operators: exact baseline vs LSH (AND-OR amplified) vs IVF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts2g2_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("embedding"))
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def exact(emb):
    q = emb.where(F.col("vec_id") < 5)
    return {(r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk(emb, q, k=5).collect()}


def test_cosine_topk_shape(emb, exact):
    assert len(exact) == 25  # 5 queries x top-5, self excluded


def test_lsh_recall_and_pruning(emb, exact):
    q = emb.where(F.col("vec_id") < 5)
    got = {(r.query_id, r.neighbor_id)
           for r in similarity.lsh_bucket_topk(emb, q, k=5).collect()}
    assert len(got) == 25
    recall = len(got & exact) / len(exact)
    # near-random synthetic embeddings are sign-LSH's adversarial case;
    # measured 0.52 at defaults — assert a conservative floor
    assert recall >= 0.3, recall


def test_ivf_recall(emb, exact):
    q = emb.where(F.col("vec_id") < 5)
    got = {(r.query_id, r.neighbor_id)
           for r in similarity.ivf_topk(emb, q, k=5).collect()}
    assert len(got) == 25
    assert len(got & exact) / len(exact) >= 0.3


def test_ivf_seeding_plan(emb):
    """Seeding must be a per-partition top-K (TakeOrderedAndProject), not a
    global sort: no Exchange/Sort stage may appear in the seeding plan."""
    plan = similarity.ivf_seed_plan(emb, n_lists=8)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_lsh_deterministic(emb):
    q = emb.where(F.col("vec_id") < 3)
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in
               similarity.lsh_bucket_topk(emb, q, k=5).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank) for r in
               similarity.lsh_bucket_topk(emb, q, k=5).collect())
    assert a == b


# ----------------------------------------------- embedding near-dup dedup
def test_cosine_near_pairs_exact_vs_bruteforce(emb):
    """Exact block-matmul path equals the definitional all-pairs filter."""
    import numpy as np

    rows = emb.where(F.col("vec_id") < 60).collect()
    ids = [r.vec_id for r in rows]
    M = np.stack([np.asarray(r.embedding) for r in rows])
    n = M / np.sqrt((M * M).sum(1, keepdims=True))
    C = n @ n.T
    want = {(ids[i], ids[j]) for i in range(len(ids))
            for j in range(len(ids)) if ids[i] < ids[j] and C[i, j] >= 0.3}
    got = {(r.id_a, r.id_b) for r in similarity.cosine_near_pairs(
        emb.where(F.col("vec_id") < 60), 0.3).collect()}
    assert got == want and got  # nonempty at this threshold


def test_cosine_near_pairs_lsh_recall(emb):
    """LSH path: subset of exact with usable recall at default settings."""
    exact_pairs = {(r.id_a, r.id_b) for r in similarity.cosine_near_pairs(
        emb, 0.3).collect()}
    lsh_pairs = {(r.id_a, r.id_b) for r in similarity.cosine_near_pairs(
        emb, 0.3, use_lsh=True).collect()}
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) / max(len(exact_pairs), 1) >= 0.3


def test_cosine_near_pairs_empty_corpus(emb):
    out = similarity.cosine_near_pairs(emb.where(F.col("vec_id") < 0), 0.5)
    assert out.collect() == []


def test_ivf_empty_corpus(emb):
    out = similarity.ivf_topk(
        emb.where(F.col("vec_id") < 0), emb.limit(2), k=3, n_lists=4)
    assert out.collect() == []


def test_lsh_candidate_pairs_empty_sigs(spark):
    from ts2g2_spark.operators import dedup

    empty = spark.createDataFrame([], "doc_id long, sig array<long>")
    assert dedup.lsh_candidate_pairs(empty, bands=8).collect() == []
