"""Analytics operators (SURVEY §2.6 E1/E4) vs reference + networkx."""

from __future__ import annotations

import numpy as np
import pytest

from ts2g2_spark.operators import analytics


def test_eigenvector_centrality_matches_networkx():
    import networkx as nx

    rng = np.random.default_rng(4)
    for trial in range(5):
        n = int(rng.integers(4, 12))
        g = nx.gnp_random_graph(n, 0.5, seed=int(rng.integers(1e6)))
        if not nx.is_connected(g):
            g = nx.compose(g, nx.path_graph(n))
        # eigenvector_centrality_numpy needs scipy.sparse (absent here);
        # the pure-python power iteration converges to the same dominant
        # eigenvector (nx normalizes to L2 norm 1, like the kernel)
        ref = nx.eigenvector_centrality(g, max_iter=2000, tol=1e-12)
        e = np.array(g.edges(), dtype=np.int64)
        got = analytics.eigenvector_centrality_kernel(n, e[:, 0], e[:, 1])
        want = np.array([ref[i] for i in range(n)])
        assert np.allclose(np.abs(got), np.abs(want), atol=1e-6)


def test_eigenvector_centrality_spark(spark):
    import networkx as nx

    g = nx.path_graph(5)
    edges = spark.createDataFrame(
        [("s", int(a), int(b)) for a, b in g.edges()],
        "series_key string, src long, dst long")
    row = analytics.eigenvector_centrality(edges).collect()[0]
    ref = nx.eigenvector_centrality(g, max_iter=2000, tol=1e-12)
    assert np.allclose(row.embedding,
                       [ref[i] for i in range(5)], atol=1e-6)


def test_embedding_ranking_and_tau_parity(spark, reference):
    """Reference EmbeddingRanking with hand-set embedding dictionaries
    (embeddings/ts2g2_embeddings.py:65-95) vs the engine's DataFrame
    ranking + exact-pair Kendall tau.

    The reference module's TAIL imports gensim / torch / its own (empty
    upstream) vendored ts2vec (lines 108-126), so the module can't import
    anywhere; EmbeddingRanking itself (lines 28-102) only needs
    numpy + scipy.stats — exec just that prefix as the oracle."""
    src = open("/root/reference/embeddings/ts2g2_embeddings.py").read()
    prefix = src.split("import networkx as nx", 1)[0]
    prefix = prefix.replace("from core.model import TimeseriesView",
                            "TimeseriesView = object")
    ns: dict = {}
    exec(compile(prefix, "ts2g2_embeddings_prefix", "exec"), ns)
    EmbeddingRanking = ns["EmbeddingRanking"]

    rng = np.random.default_rng(8)
    ids = list("abcde")
    d = 6
    emb0 = {i: rng.uniform(0, 1, d) for i in ids}
    emb1 = {i: rng.uniform(0, 1, d) for i in ids}

    er = EmbeddingRanking(embedding_length=d)
    er.to_graph_methods = [object()]  # one graph method
    er.dictionaries = [emb0, emb1]
    er.embedding_ranking()
    ref_tau = er.kendall_tau_correlation()[0]

    rows = [(i, "m0", emb0[i].tolist()) for i in ids] + [
        (i, "m1", emb1[i].tolist()) for i in ids]
    df = spark.createDataFrame(rows, "id string, method string, "
                                     "vector array<double>")
    ranked = analytics.embedding_ranking(df)
    got_order = {
        m: [r.id for r in ranked.where(ranked.method == m)
            .orderBy("rank").collect()]
        for m in ("m0", "m1")
    }
    assert got_order["m0"] == er.ranking[0]
    assert got_order["m1"] == er.ranking[1]

    tau = analytics.kendall_tau(
        ranked.where(ranked.method == "m0"),
        ranked.where(ranked.method == "m1")).collect()[0].tau
    assert tau == pytest.approx(ref_tau, abs=1e-12)
