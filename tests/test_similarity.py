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


def test_semantic_dedup_planted_near_dups(spark):
    """A planted eps-ball (three near-identical vectors) keeps only its
    minimum id; distinct vectors all survive; the keep rule is local
    (every dropped vector names its smallest qualifying neighbor)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = []
    for vid in (1, 2, 3):  # near-identical ball
        rows.append((vid, (base + rng.normal(scale=1e-3, size=8)).tolist()))
    for vid in (10, 11, 12, 13):  # well-separated singletons
        rows.append((vid, rng.normal(size=8).tolist()))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = {r["vec_id"]: r for r in similarity.semantic_dedup(
        df, eps=0.2, n_lists=2).collect()}
    assert len(got) == 7
    assert got[1]["keep"] and got[1]["dup_of"] is None
    assert not got[2]["keep"] and got[2]["dup_of"] == 1
    assert not got[3]["keep"] and got[3]["dup_of"] in (1, 2)
    for vid in (10, 11, 12, 13):
        assert got[vid]["keep"], vid


def test_semantic_dedup_deterministic_and_md5_mode(emb):
    """Same input -> identical output across runs for both seeding
    hashes; md5+no-Lloyd (the oracle mode) dedups a corpus with known
    near-dup pairs (emb_cosine_dup finds pairs at 0.4)."""
    a = sorted(map(tuple, similarity.semantic_dedup(
        emb, eps=0.6, n_lists=8).collect()))
    b = sorted(map(tuple, similarity.semantic_dedup(
        emb, eps=0.6, n_lists=8).collect()))
    assert a == b
    m = similarity.semantic_dedup(emb, eps=0.6, n_lists=8,
                                  seed_hash="md5", lloyd=False)
    rows = m.collect()
    assert len(rows) == emb.count()  # one verdict per vector
    dropped = [r for r in rows if not r["keep"]]
    assert dropped, "corpus with cosine>=0.4 pairs must drop something"
    for r in dropped:
        assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]


def test_semantic_dedup_edges(spark, emb):
    import pandas as pd
    import pytest as _pt

    with _pt.raises(ValueError, match="eps"):
        similarity.semantic_dedup(emb, eps=0.0)
    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>")
    assert similarity.semantic_dedup(empty).count() == 0
    one = spark.createDataFrame(
        pd.DataFrame({"vec_id": [7], "embedding": [[1.0, 0.0]]}))
    got = similarity.semantic_dedup(one, eps=0.5, n_lists=4).collect()
    assert len(got) == 1 and got[0]["keep"]


def test_recall_at_k_counts(spark):
    """recall = |approx ∩ exact| / |exact| per query; missing approx
    rows count as misses; queries absent from exact emit nothing."""
    import pandas as pd
    from ts2g2_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(pd.DataFrame({
        "query_id":    [1, 1, 1, 2, 2],
        "neighbor_id": [10, 11, 12, 20, 21]}))
    approx = spark.createDataFrame(pd.DataFrame({
        "query_id":    [1, 1, 1, 3],
        "neighbor_id": [10, 12, 99, 30]}))
    out = {r.query_id: r for r in recall_at_k(approx, exact).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_exact, out[1].n_hits) == (3, 2)
    assert out[1].recall == round(2 / 3, 6)
    assert (out[2].n_exact, out[2].n_hits, out[2].recall) == (2, 0, 0.0)
    # duplicate approx pairs (multi-table candidate frames) must not
    # inflate n_exact via join fan-out
    dup = spark.createDataFrame(pd.DataFrame({
        "query_id":    [1, 1, 1, 1],
        "neighbor_id": [10, 10, 10, 12]}))
    d = {r.query_id: r for r in recall_at_k(dup, exact).collect()}
    assert (d[1].n_exact, d[1].n_hits) == (3, 2)


def test_ivf_cluster_topk_self_probe_recall(spark):
    """ivf_cluster_topk == brute force restricted to the query's own
    list; exact-vs-exact recall is 1.0; clustered data gets high recall
    at nprobe=1."""
    import pandas as pd
    from ts2g2_spark.operators.similarity import (
        cosine_topk, ivf_cluster_topk, recall_at_k)

    import numpy as np

    rng = np.random.default_rng(9)
    # two well-separated clusters -> same-cluster neighbors dominate
    vecs = np.concatenate([
        rng.normal(0, 0.05, (30, 8)) + np.r_[[1.0] + [0.0] * 7],
        rng.normal(0, 0.05, (30, 8)) + np.r_[[0.0] * 7 + [1.0]],
    ])
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": range(60), "embedding": list(map(list, vecs))}))
    qids = emb.where("vec_id < 10").select("vec_id")
    approx = ivf_cluster_topk(emb, qids, k=3, n_lists=2)
    exact = cosine_topk(emb, emb.where("vec_id < 10"), k=3)
    rec = recall_at_k(approx, exact).toPandas()
    assert len(rec) == 10 and rec.recall.mean() > 0.9
    # self-consistency: recall of exact against itself is 1.0
    self_rec = recall_at_k(exact, exact).toPandas()
    assert (self_rec.recall == 1.0).all()
    # empty corpus: empty result, no error
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ivf_cluster_topk(empty, qids, k=3).count() == 0


def test_ivf_cluster_topk_nprobe_recall_curve(spark):
    """Multiprobe IVF: recall is monotone non-decreasing in nprobe, and
    nprobe == n_lists probes every list, which IS brute force (recall
    1.0 exactly).  Candidate pairs stay unique across probed lists."""
    import pandas as pd
    from ts2g2_spark.operators.similarity import (
        cosine_topk, ivf_cluster_topk, recall_at_k)

    import numpy as np
    import pytest

    rng = np.random.default_rng(31)
    vecs = rng.normal(0, 1.0, (80, 8))  # unclustered -> nprobe=1 lossy
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": range(80), "embedding": list(map(list, vecs))}))
    qids = emb.where("vec_id < 12").select("vec_id")
    exact = cosine_topk(emb, emb.where("vec_id < 12"), k=5)
    means = {}
    for nprobe in (1, 2, 4):
        ap = ivf_cluster_topk(emb, qids, k=5, n_lists=4, nprobe=nprobe)
        pairs = ap.select("query_id", "neighbor_id")
        assert pairs.count() == pairs.distinct().count()
        means[nprobe] = recall_at_k(ap, exact).toPandas().recall.mean()
    assert means[1] <= means[2] <= means[4]
    assert means[4] == 1.0  # all lists probed == exact
    assert means[1] < 1.0   # random data: own-list probe must miss some
    with pytest.raises(ValueError):
        ivf_cluster_topk(emb, qids, n_lists=4, nprobe=5)


def test_ivf_recall_curve_matches_per_nprobe_calls(spark):
    """The single-pass curve == the per-nprobe ivf_cluster_topk calls,
    row for row (same candidates, cosines, ranks); grouped recall_at_k
    == per-variant recall_at_k."""
    import pandas as pd
    from ts2g2_spark.operators.similarity import (
        cosine_topk, ivf_cluster_topk, ivf_recall_curve, recall_at_k)

    import numpy as np

    rng = np.random.default_rng(77)
    vecs = rng.normal(0, 1.0, (60, 6))
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": range(60), "embedding": list(map(list, vecs))}))
    qids = emb.where("vec_id < 8").select("vec_id")
    curve = ivf_recall_curve(emb, qids, k=4, n_lists=4, nprobes=(1, 2, 4))
    got = {(r.nprobe, r.query_id, r.neighbor_id, r.cosine, r.rank)
           for r in curve.collect()}
    want = set()
    for np_ in (1, 2, 4):
        for r in ivf_cluster_topk(emb, qids, k=4, n_lists=4,
                                  nprobe=np_).collect():
            want.add((np_, r.query_id, r.neighbor_id, r.cosine, r.rank))
    assert got == want
    exact = cosine_topk(emb, emb.where("vec_id < 8"), k=4)
    grouped = recall_at_k(curve, exact, group_cols=("nprobe",)).toPandas()
    for np_ in (1, 2, 4):
        solo = recall_at_k(
            curve.where(F.col("nprobe") == np_), exact).toPandas()
        g = grouped[grouped.nprobe == np_].drop(columns=["nprobe"])
        m = g.merge(solo, on="query_id", suffixes=("_g", "_s"))
        assert len(m) == len(solo)
        for c in ("n_exact", "n_hits", "recall"):
            assert (m[f"{c}_g"] == m[f"{c}_s"]).all(), (np_, c)


def test_recall_at_k_group_values_keeps_empty_variants(spark):
    """An index level with ZERO approx rows must read as recall 0, not
    vanish: group_values pins the variant set independent of the data."""
    from ts2g2_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "query_id long, neighbor_id long")
    approx = spark.createDataFrame(
        [(2, 1, 10)], "nprobe int, query_id long, neighbor_id long")
    out = recall_at_k(approx, exact, group_cols=("nprobe",),
                      group_values=[(1,), (2,)]).toPandas()
    assert sorted(out.nprobe.unique()) == [1, 2]
    lvl1 = out[out.nprobe == 1]
    assert (lvl1.n_hits == 0).all() and (lvl1.recall == 0.0).all()
    assert len(lvl1) == 2  # both queries present with zero recall
    lvl2 = out[(out.nprobe == 2) & (out.query_id == 1)]
    assert lvl2.n_hits.iloc[0] == 1
    # derived mode (no group_values) drops the empty level — documented
    derived = recall_at_k(approx, exact, group_cols=("nprobe",)).toPandas()
    assert sorted(derived.nprobe.unique()) == [2]


# --- int8 quantization (round 5) -------------------------------------------


def test_quantize_embeddings_codes(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125, 0.0]),
         (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in
            similarity.quantize_embeddings(df).collect()}
    # max |element| always maps to +-127; others scale linearly
    # -0.25/scale = -63.5: the floor quantizer is half-up toward +inf
    # (floor(-63.5 + 0.5) = -63), matching kernels.quantize_ieee
    assert rows[1].qvec == [127, -63, 32, 0]
    assert rows[1].scale == pytest.approx(0.5 / 127.0)
    # all-zero vector: floor-guarded scale, all-zero codes (not a crash)
    assert rows[2].qvec == [0, 0, 0, 0]


def test_quantized_topk_contract(spark):
    # hand-built 2-d codes: exact cosines are rationals over small ints
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0]),
         (3, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    q8 = similarity.quantize_embeddings(df)
    qids = df.where(F.col("vec_id") == 0).select("vec_id")
    got = similarity.quantized_cosine_topk(q8, qids, k=3).collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].cosine == pytest.approx(1.0, abs=1e-4)  # ~parallel
    assert got[1].cosine == 0.0   # orthogonal
    assert got[2].cosine == -1.0  # antipodal


def test_quantized_recall_near_one(spark, emb, exact):
    # 64-dim int8 keeps brute-force top-5 membership almost intact
    q8 = similarity.quantize_embeddings(emb)
    qids = emb.where(F.col("vec_id") < 5).select("vec_id")
    got = {(r.query_id, r.neighbor_id)
           for r in similarity.quantized_cosine_topk(q8, qids, k=5)
           .collect()}
    assert len(got) == 25
    assert len(got & exact) / len(exact) >= 0.8


def test_quantized_topk_drops_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [0.5, 0.5]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    q8 = similarity.quantize_embeddings(df)
    got = similarity.quantized_cosine_topk(
        q8, df.select("vec_id"), k=5).collect()
    ids = {(r.query_id, r.neighbor_id) for r in got}
    # the zero vector appears on neither side
    assert ids == {(0, 1), (1, 0)}


# --- product quantization (round 5) -----------------------------------------


def test_pq_codebook_shape_and_seeding(spark, emb):
    cb = similarity.pq_codebook(emb, dim=64, m=8, ks=4)
    rows = cb.collect()
    assert len(rows) == 32  # m x ks
    assert all(len(r.centroid) == 8 for r in rows)
    # deterministic: same seeds in the same order on a second call
    again = similarity.pq_codebook(emb, dim=64, m=8, ks=4).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    # subspace s of centroid j is the seed's s-th slice: reassembling
    # all m slices of j gives back one corpus vector
    byj = {}
    for r in rows:
        byj.setdefault(r.j, {})[r.s] = list(r.centroid)
    vecs = {tuple(r.embedding) for r in emb.collect()}
    for j, subs in byj.items():
        whole = tuple(x for s in range(8) for x in subs[s])
        assert whole in vecs
    with pytest.raises(ValueError):
        similarity.pq_codebook(emb, dim=64, m=7)


def test_pq_encode_seeds_self_assign(spark, emb):
    # every seed vector's nearest centroid in every subspace is its own
    # slice (distance exactly 0)
    cb = similarity.pq_codebook(emb, dim=64, m=8, ks=4)
    codes = similarity.pq_encode(emb, cb, dim=64, m=8)
    from ts2g2_spark.functions.hashing import h64

    seed_ids = [r.vec_id for r in emb.select("vec_id").orderBy(
        h64(F.col("vec_id").cast("string")), "vec_id").limit(4).collect()]
    got = {(r.vec_id, r.s): r.code for r in codes.collect()
           if r.vec_id in seed_ids}
    for j, vid in enumerate(seed_ids):
        for s in range(8):
            assert got[(vid, s)] == j
    # every vector gets exactly m codes in [0, ks)
    n = emb.count()
    assert codes.count() == n * 8
    assert codes.where((F.col("code") < 0) | (F.col("code") >= 4)) \
                .count() == 0


def test_pq_topk_shape_and_recall_floor(spark, emb, exact):
    got = similarity.pq_topk(
        emb, emb.where(F.col("vec_id") < 5).select("vec_id"),
        dim=64, k=5, m=8, ks=16).collect()
    assert len(got) == 25
    assert sorted({r.rank for r in got}) == [1, 2, 3, 4, 5]
    assert all(r.query_id != r.neighbor_id for r in got)
    pairs = {(r.query_id, r.neighbor_id) for r in got}
    # 64x-compressed codes on near-random embeddings (the adversarial
    # case): far better than chance (5/500), far below int8's 0.99
    assert len(pairs & exact) / len(exact) > 0.02


# --- IVFPQ (round 5) ---------------------------------------------------------


def test_ivfpq_topk_shape_and_candidate_scope(spark, emb, exact):
    got = similarity.ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 5).select("vec_id"),
        dim=64, k=5, n_lists=8, nprobe=2).collect()
    assert len(got) == 25
    assert sorted({r.rank for r in got}) == [1, 2, 3, 4, 5]
    assert all(r.query_id != r.neighbor_id for r in got)
    # every returned neighbor must live in one of the query's 2 probed
    # coarse lists (the pruning contract)
    coarse = similarity._coarse_frame(emb, 8, "vec_id", "embedding")
    asg = {r.vec_id: r.list_id for r in similarity._coarse_assign(
        emb, coarse, "vec_id", "embedding").collect()}
    cents = {r.list_id: r.c for r in coarse.collect()}
    import numpy as np
    for qid in range(5):
        qv = np.array(
            emb.where(F.col("vec_id") == qid).head().embedding)
        d2 = sorted((((qv - np.array(c)) ** 2).sum(), li)
                    for li, c in cents.items())
        probed = {li for _, li in d2[:2]}
        for r in got:
            if r.query_id == qid:
                assert asg[r.neighbor_id] in probed


def test_ivfpq_nprobe_full_matches_pq_candidates(spark, emb):
    # nprobe = n_lists disables pruning: the candidate set is the whole
    # corpus, so IVFPQ returns 5 ranked rows per query like plain PQ
    got = similarity.ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 3).select("vec_id"),
        dim=64, k=5, n_lists=4, nprobe=4).collect()
    assert len(got) == 15


def test_ivfpq_validation(spark, emb):
    q = emb.select("vec_id")
    with pytest.raises(ValueError):
        similarity.ivfpq_topk(emb, q, dim=64, nprobe=9, n_lists=8)
    with pytest.raises(ValueError):
        similarity.ivfpq_topk(emb, q, dim=64, k=0)
    with pytest.raises(ValueError):
        similarity.ivfpq_topk(emb, q, dim=64, m=7)


def test_mrl_recall_full_width_is_one_and_shape(spark):
    import numpy as np

    from ts2g2_spark.operators.similarity import mrl_recall

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)])
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 8")
    out = mrl_recall(df, q, dims=(4, 8, 16), k=5).collect()
    # every (dim, query) present; at full width the sets are identical
    assert len(out) == 3 * 8
    for r in out:
        assert r.n_exact == 5
        assert 0.0 <= r.recall <= 1.0
        if r.dim == 16:
            assert r.recall == 1.0
    # truncation can only be evaluated, never crash: clamp beyond width
    over = mrl_recall(df, q, dims=(99,), k=3).collect()
    assert all(r.recall == 1.0 for r in over)  # slice clamps to full


def test_mrl_recall_prefix_signal_orders_levels(spark):
    import numpy as np

    from ts2g2_spark.operators.similarity import mrl_recall

    # all signal in the first 8 dims, zero tail: the full-width cosine
    # IS the prefix-8 cosine, so recall(8) = 1.0 exactly; prefix-2
    # discards 6 signal dims and must do no better
    rng = np.random.default_rng(11)
    rows = []
    for i in range(80):
        head = rng.normal(size=8)
        rows.append((i, [float(x) for x in head] + [0.0] * 24))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 10")
    out = mrl_recall(df, q, dims=(2, 8), k=5).collect()
    mean = {d: np.mean([r.recall for r in out if r.dim == d])
            for d in (2, 8)}
    assert mean[8] == 1.0
    assert mean[2] < 1.0


def test_mrl_recall_validation(spark):
    import pytest as _pytest

    from ts2g2_spark.operators.similarity import mrl_recall

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="mrl_recall"):
        mrl_recall(df, df, dims=())
    with _pytest.raises(ValueError, match="mrl_recall"):
        mrl_recall(df, df, dims=(4, 4))
    with _pytest.raises(ValueError, match="mrl_recall"):
        mrl_recall(df, df, dims=(0,))
    with _pytest.raises(ValueError, match="mrl_recall"):
        mrl_recall(df, df, dims=(2,), k=0)
