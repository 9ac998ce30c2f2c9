"""Fused map-only graph-metric kernels vs the relational twins.

The fused path (kernels.graph_*_kernel inside one mapInPandas over the
series frame) must be BIT-IDENTICAL to the relational operators in
operators/graphmetrics.py — same node sets, same integer counts, and the
same HALF_UP per-iteration rounding trajectory for PageRank.  Also pins
kernels.round_half_up against Spark's own round() on adversarial dyadic
values (np.round would half-even these the other way).
"""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts2g2_spark.operators import graphs
from ts2g2_spark.operators.graphmetrics import (
    clustering_coefficients, clustering_from_series, graph_summary,
    graph_summary_from_series, pagerank, pagerank_from_series,
)
from ts2g2_spark.operators.kernels import (
    graph_clustering_kernel, graph_pagerank_kernel, graph_summary_kernel,
    round_half_up,
)

SERIES = {
    "flat": [1.0] * 8,
    "ramp": [float(i) for i in range(12)],
    "saw": [1.0, 5.0, 2.0, 6.0, 1.0, 7.0, 3.0, 5.0, 2.0],
    "tiny": [2.0, 1.0],
    "one": [3.0],
    "rand": np.random.default_rng(11).normal(size=60).tolist(),
    "steps": [1.0, 1.0, 2.0, 2.0, 1.0, 3.0, 3.0, 1.0, 2.0, 4.0],
}


@pytest.fixture(scope="module")
def series_df(spark):
    pdf = pd.DataFrame(
        {"series_key": list(SERIES), "values": list(SERIES.values())}
    )
    return spark.createDataFrame(pdf).cache()


def _sorted_pdf(df, keys):
    return df.orderBy(*keys).toPandas().reset_index(drop=True)


@pytest.mark.parametrize("kind", ["horizontal", "natural"])
def test_fused_summary_bitequal_relational(spark, series_df, kind):
    edges = graphs.visibility_edges(series_df, kind=kind)
    rel = _sorted_pdf(graph_summary(edges), ["series_key"])
    fus = _sorted_pdf(
        graph_summary_from_series(series_df, kind=kind), ["series_key"]
    )
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])


@pytest.mark.parametrize("kind", ["horizontal", "natural"])
def test_fused_clustering_bitequal_relational(spark, series_df, kind):
    edges = graphs.visibility_edges(series_df, kind=kind)
    rel = _sorted_pdf(
        clustering_coefficients(edges), ["series_key", "node"]
    )
    fus = _sorted_pdf(
        clustering_from_series(series_df, kind=kind),
        ["series_key", "node"],
    )
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])


def test_fused_pagerank_bitequal_relational(spark, series_df):
    edges = graphs.visibility_edges(series_df, kind="horizontal")
    kw = dict(iters=5, damping=0.85, round_dp=9)
    rel = _sorted_pdf(pagerank(edges, **kw), ["series_key", "node"])
    fus = _sorted_pdf(
        pagerank_from_series(series_df, kind="horizontal", **kw),
        ["series_key", "node"],
    )
    # exact float equality — identical rounding trajectory, no tolerance
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])


# ------------------------------------------------------- kernel vs networkx
GRAPHS = {
    "tri": [(0, 1), (1, 2), (0, 2)],
    "k4": [(a, b) for a in range(4) for b in range(a + 1, 4)],
    "star": [(0, i) for i in range(1, 6)],
    "rand": [
        (int(u), int(v))
        for u, v in np.random.default_rng(7).integers(0, 30, (120, 2))
        if u != v
    ],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_clustering_kernel_matches_networkx(name):
    e = np.array(GRAPHS[name], dtype=np.int64)
    nodes, degree, tri, lcc = graph_clustering_kernel(e)
    g = nx.Graph()
    g.add_edges_from(GRAPHS[name])
    nxt = nx.triangles(g)
    nxc = nx.clustering(g)
    for n, d, t, c in zip(nodes, degree, tri, lcc):
        assert d == g.degree[int(n)]
        assert t == nxt[int(n)]
        assert c == pytest.approx(nxc[int(n)], abs=1e-9)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_clustering_kernel_sparse_path_matches_dense(name, monkeypatch):
    # force the CSR intersection path by shrinking the dense cutoff
    import ts2g2_spark.operators.kernels as K

    e = np.array(GRAPHS[name], dtype=np.int64)
    dense = graph_clustering_kernel(e)

    src = K.graph_clustering_kernel.__doc__  # keep coverage honest
    assert "4096" in src

    def sparse_variant(edges):
        a, b, nodes, degree = K._canonical_edge_arrays(edges)
        n = len(nodes)
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        nbr_start = np.zeros(n + 1, dtype=np.int64)
        np.add.at(nbr_start, ia + 1, 1)
        np.add.at(nbr_start, ib + 1, 1)
        nbr_start = np.cumsum(nbr_start)
        nbrs = np.empty(2 * len(ia), dtype=np.int64)
        fill = nbr_start[:-1].copy()
        for u, v in zip(ia, ib):
            nbrs[fill[u]] = v
            fill[u] += 1
            nbrs[fill[v]] = u
            fill[v] += 1
        for u in range(n):
            nbrs[nbr_start[u]: nbr_start[u + 1]].sort()
        tri = np.zeros(n, dtype=np.int64)
        for u, v in zip(ia, ib):
            common = np.intersect1d(
                nbrs[nbr_start[u]: nbr_start[u + 1]],
                nbrs[nbr_start[v]: nbr_start[v + 1]],
                assume_unique=True,
            )
            tri[u] += len(common)
            tri[v] += len(common)
            tri[common] += 1
        tri //= 3
        return nodes, degree, tri

    n2, d2, t2 = sparse_variant(e)
    assert np.array_equal(dense[0], n2)
    assert np.array_equal(dense[1], d2)
    assert np.array_equal(dense[2], t2)


def test_pagerank_kernel_sums_to_one_and_matches_dense_model():
    # independent dense power-iteration reference (no rounding), run to
    # convergence — the kernel's rounded trajectory must land within
    # round-off of the fixpoint and agree on the top-5 ranking
    e = np.array(GRAPHS["rand"], dtype=np.int64)
    nodes, rank = graph_pagerank_kernel(e, iters=40, damping=0.85)
    assert rank.sum() == pytest.approx(1.0, abs=1e-5)
    idx = {int(n): i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in {(min(a, b), max(a, b)) for a, b in GRAPHS["rand"]}:
        A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1.0
    P = A / A.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(500):
        r = 0.15 / n + 0.85 * (P.T @ r)
    assert np.allclose(rank, r, atol=1e-6)
    assert set(np.argsort(-rank)[:5]) == set(np.argsort(-r)[:5])


def test_summary_kernel_matches_networkx():
    for name, edges in GRAPHS.items():
        s = graph_summary_kernel(np.array(edges, dtype=np.int64))
        g = nx.Graph()
        g.add_edges_from(edges)
        assert s["n_nodes"] == g.number_of_nodes()
        assert s["n_edges"] == g.number_of_edges()
        assert s["max_degree"] == max(d for _, d in g.degree)
        assert s["density"] == pytest.approx(nx.density(g), abs=1e-9)


def test_empty_and_selfloop_edges():
    z = np.empty((0, 2), dtype=np.int64)
    assert graph_summary_kernel(z)["n_nodes"] == 0
    nodes, rank = graph_pagerank_kernel(z)
    assert len(nodes) == 0 and len(rank) == 0
    only_self = np.array([[3, 3]], dtype=np.int64)
    assert graph_summary_kernel(only_self)["n_edges"] == 0


# --------------------------------------------------- rounding contract
def test_round_half_up_matches_spark_round(spark):
    # dyadic values land EXACTLY on .5 at the 10th decimal — np.round
    # would half-even them down; Spark's BigDecimal HALF_UP goes up.
    vals = [
        2.0 ** -10,            # 0.0009765625  -> 0.000976563
        3 * 2.0 ** -10,        # 0.0029296875  -> 0.002929688
        2.0 ** -11,            # 0.00048828125 -> 0.000488281 (digit 4)
        0.1234567895,          # shortest-repr half case
        1.0 / 3.0,
        0.15 / 7,
        1e-10, 0.0, 1.0,
    ]
    ours = round_half_up(np.array(vals), 9)
    theirs = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 9).alias("r"))
        .toPandas()["r"]
        .to_numpy()
    )
    assert np.array_equal(ours, theirs), (ours, theirs)


def test_round_half_up_negative_and_bulk_agreement():
    rng = np.random.default_rng(3)
    x = rng.normal(size=2000)
    got = round_half_up(x, 9)
    # reference: python Decimal on shortest repr (matches JVM valueOf)
    import decimal

    q = decimal.Decimal(1).scaleb(-9)
    ref = np.array([
        float(decimal.Decimal(repr(float(v))).quantize(
            q, rounding=decimal.ROUND_HALF_UP))
        for v in x
    ])
    assert np.array_equal(got, ref)


# ------------------------------------------------------------- mixing

@pytest.mark.parametrize("kind", ["horizontal", "natural"])
def test_fused_mixing_equals_relational(spark, series_df, kind):
    from ts2g2_spark.operators.graphmetrics import (
        graph_mixing, mixing_from_series,
    )

    edges = graphs.visibility_edges(series_df, kind=kind)
    rel = _sorted_pdf(graph_mixing(edges), ["series_key"])
    fus = _sorted_pdf(
        mixing_from_series(series_df, kind=kind), ["series_key"])
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])


def test_mixing_matches_networkx(spark, series_df):
    """assortativity == nx.degree_assortativity_coefficient and
    transitivity == nx.transitivity at the 6dp contract rounding, per
    series graph; degenerate graphs (tiny: one edge) give NULLs."""
    from ts2g2_spark.operators.graphmetrics import mixing_from_series

    got = {r.series_key: r for r in mixing_from_series(
        series_df, kind="horizontal").collect()}
    from ts2g2_spark.operators.kernels import visibility_graph

    for key, vals in SERIES.items():
        e, _ = visibility_graph(np.asarray(vals, float),
                                kind="horizontal")
        if len(e) == 0:
            assert key not in got
            continue
        g = nx.Graph()
        g.add_edges_from(e.tolist())
        r = got[key]
        if len({d for _, d in g.degree()}) > 1:
            want = nx.degree_assortativity_coefficient(g)
            assert r.assortativity == pytest.approx(want, abs=2e-6), key
        else:
            assert r.assortativity is None, key
        want_t = nx.transitivity(g)
        if sum(d * (d - 1) // 2 for _, d in g.degree()) > 0:
            assert r.transitivity == pytest.approx(want_t, abs=2e-6), key
        else:
            assert r.transitivity is None, key


# -------------------------------------------------------- betweenness

def test_betweenness_matches_networkx(spark, series_df):
    """Frontier-vectorized Brandes == nx.betweenness_centrality
    (normalized) at the 9dp rounding, for every series graph including
    the 2-node degenerate one."""
    from ts2g2_spark.operators.graphmetrics import betweenness_from_series
    from ts2g2_spark.operators.kernels import visibility_graph

    got = betweenness_from_series(series_df, kind="horizontal").toPandas()
    for key, vals in SERIES.items():
        e, _ = visibility_graph(np.asarray(vals, float), kind="horizontal")
        sub = got[got.series_key == key].set_index("node")
        if len(e) == 0:
            assert sub.empty
            continue
        g = nx.Graph()
        g.add_edges_from(e.tolist())
        want = nx.betweenness_centrality(g, normalized=True)
        assert set(sub.index) == set(want)
        for node, w in want.items():
            assert sub.loc[node, "betweenness"] == pytest.approx(
                w, abs=2e-9), (key, node)


def test_betweenness_path_graph_exact(spark):
    """P4 (path graph on a monotone ramp HVG): interior nodes carry
    betweenness 2/3 with nx normalization, endpoints 0 — exact values,
    no tolerance."""
    from ts2g2_spark.operators.kernels import graph_betweenness_kernel

    e = np.array([[0, 1], [1, 2], [2, 3]])
    nodes, bc = graph_betweenness_kernel(e)
    assert nodes.tolist() == [0, 1, 2, 3]
    assert bc.tolist() == [0.0, round(2 / 3, 9), round(2 / 3, 9), 0.0]


# ------------------------------------------------------- path metrics

def test_path_metrics_match_networkx(spark, series_df):
    from ts2g2_spark.operators.graphmetrics import path_metrics_from_series
    from ts2g2_spark.operators.kernels import visibility_graph

    got = {r.series_key: r for r in path_metrics_from_series(
        series_df, kind="horizontal").collect()}
    for key, vals in SERIES.items():
        e, _ = visibility_graph(np.asarray(vals, float),
                                kind="horizontal")
        if len(e) == 0:
            assert key not in got
            continue
        g = nx.Graph()
        g.add_edges_from(e.tolist())
        r = got[key]
        assert r.connected  # HVGs: adjacent points always see each other
        assert r.n_nodes == g.number_of_nodes()
        assert r.diameter == nx.diameter(g), key
        assert r.radius == nx.radius(g), key
        assert r.avg_spl == pytest.approx(
            nx.average_shortest_path_length(g), abs=1e-12), key


def test_path_metrics_disconnected_reachable_pairs():
    """Two disjoint edges: per-component eccentricities, average over
    reachable ordered pairs only, connected=False."""
    from ts2g2_spark.operators.kernels import graph_path_metrics_kernel

    e = np.array([[0, 1], [5, 6]])
    m = graph_path_metrics_kernel(e)
    assert m == {"n_nodes": 4, "diameter": 1, "radius": 1,
                 "avg_spl": 1.0, "connected": False}
    assert graph_path_metrics_kernel(np.empty((0, 2), int)) is None


def test_kcore_matches_networkx(spark, series_df):
    """Simultaneous-peel core numbers == nx.core_number for every
    series graph — exact integers, no tolerance."""
    from ts2g2_spark.operators.graphmetrics import kcore_from_series
    from ts2g2_spark.operators.kernels import visibility_graph

    got = kcore_from_series(series_df, kind="horizontal").toPandas()
    for key, vals in SERIES.items():
        e, _ = visibility_graph(np.asarray(vals, float), kind="horizontal")
        sub = got[got.series_key == key].set_index("node")["core"]
        if len(e) == 0:
            assert sub.empty
            continue
        g = nx.Graph()
        g.add_edges_from(e.tolist())
        want = nx.core_number(g)
        assert sub.to_dict() == want, key


def test_kcore_kernel_random_graphs():
    """Kernel vs networkx on random (non-visibility) graphs, including
    self-loops and duplicate edges the canonicalizer must drop."""
    from ts2g2_spark.operators.kernels import graph_kcore_kernel

    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(4, 80))
        m = int(rng.integers(3, n * 3))
        e = rng.integers(0, n, size=(m, 2))
        g = nx.Graph()
        g.add_edges_from(t for t in map(tuple, e.tolist()) if t[0] != t[1])
        nodes, core = graph_kcore_kernel(e)
        want = nx.core_number(g)
        assert dict(zip(nodes.tolist(), core.tolist())) == want, trial
    # empty edge set
    nodes, core = graph_kcore_kernel(np.empty((0, 2), dtype=np.int64))
    assert len(nodes) == 0 and len(core) == 0


# ------------------------------------------------------------------ LPA

def _brute_lpa(edges, n_iter):
    """Reference sync-LPA: neighbor-majority, ties to smallest label."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    lab = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n in adj:
            c = defaultdict(int)
            for nb in adj[n]:
                c[lab[nb]] += 1
            new[n] = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = new
    return lab


def test_lpa_kernel_random_graphs():
    from ts2g2_spark.operators.kernels import graph_lpa_kernel

    rng = np.random.default_rng(17)
    for trial in range(30):
        m = int(rng.integers(1, 50))
        e = rng.integers(0, 18, size=(m, 2))
        nodes, comm = graph_lpa_kernel(e, n_iter=4)
        want = _brute_lpa(map(tuple, e.tolist()), 4)
        assert dict(zip(nodes.tolist(), comm.tolist())) == want, trial
    nodes, comm = graph_lpa_kernel(np.empty((0, 2), dtype=np.int64))
    assert len(nodes) == 0 and len(comm) == 0
    with pytest.raises(ValueError):
        graph_lpa_kernel(np.array([[0, 1]]), n_iter=0)


def test_lpa_relational_matches_fused(spark):
    from ts2g2_spark.operators import graphmetrics
    from ts2g2_spark.operators.kernels import visibility_graph

    rng = np.random.default_rng(23)
    series_rows = [
        (str(k), [float(x) for x in rng.integers(0, 9, 40)])
        for k in range(5)
    ]
    sdf = spark.createDataFrame(
        series_rows, "series_key string, values array<double>")
    fused = {
        (r.series_key, r.node): r.community
        for r in graphmetrics.lpa_from_series(
            sdf, kind="horizontal", n_iter=4).collect()
    }
    edge_rows = []
    for key, vals in series_rows:
        e, _ = visibility_graph(np.asarray(vals, float), kind="horizontal")
        edge_rows += [(key, int(a), int(b)) for a, b in e]
    edf = spark.createDataFrame(
        edge_rows, "series_key string, src long, dst long")
    rel = {
        (r.series_key, r.node): r.community
        for r in graphmetrics.lpa_communities(edf, n_iter=4).collect()
    }
    assert fused == rel
    with pytest.raises(ValueError):
        graphmetrics.lpa_communities(edf, n_iter=0)


def test_lpa_labels_two_cliques():
    """Two triangles joined by one bridge edge resolve to exactly the
    two clique communities (the label VALUES are schedule artifacts —
    the bridge carries node 2's label into the right clique — so the
    assertion pins the partition, not the labels)."""
    from ts2g2_spark.operators.kernels import graph_lpa_kernel

    e = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]])
    nodes, comm = graph_lpa_kernel(e, n_iter=4)
    got = dict(zip(nodes.tolist(), comm.tolist()))
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (3, 4, 5)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_modularity_kernel_vs_networkx():
    """Kernel Q for the LPA partition == nx.community.modularity of the
    same partition, on random graphs."""
    from ts2g2_spark.operators.kernels import (
        graph_lpa_kernel, graph_modularity_kernel)

    rng = np.random.default_rng(31)
    for trial in range(20):
        m = int(rng.integers(3, 60))
        e = rng.integers(0, 20, size=(m, 2))
        nodes, lab = graph_lpa_kernel(e, n_iter=4)
        n_comm, q = graph_modularity_kernel(e, n_iter=4)
        g = nx.Graph()
        g.add_edges_from(t for t in map(tuple, e.tolist()) if t[0] != t[1])
        part = {}
        for n2, l in zip(nodes.tolist(), lab.tolist()):
            part.setdefault(l, set()).add(n2)
        want = nx.algorithms.community.modularity(g, part.values())
        assert abs(q - want) < 1e-9, trial
        assert n_comm == len(part)
    # edgeless
    assert graph_modularity_kernel(np.empty((0, 2), np.int64)) == (0, 0.0)


def test_modularity_relational_matches_fused(spark):
    from ts2g2_spark.operators import graphmetrics
    from ts2g2_spark.operators.kernels import visibility_graph

    rng = np.random.default_rng(37)
    series_rows = [
        (str(k), [float(x) for x in rng.integers(0, 9, 35)])
        for k in range(4)
    ]
    sdf = spark.createDataFrame(
        series_rows, "series_key string, values array<double>")
    fused = {
        r.series_key: (r.n_communities, r.modularity)
        for r in graphmetrics.lpa_modularity_from_series(
            sdf, n_iter=4).collect()
    }
    edge_rows = []
    for key, vals in series_rows:
        e, _ = visibility_graph(np.asarray(vals, float), kind="horizontal")
        edge_rows += [(key, int(a), int(b)) for a, b in e]
    edf = spark.createDataFrame(
        edge_rows, "series_key string, src long, dst long")
    comm = graphmetrics.lpa_communities(edf, n_iter=4)
    rel = {
        r.series_key: (r.n_communities, r.modularity)
        for r in graphmetrics.modularity(edf, comm).collect()
    }
    assert fused == rel


# ------------------------------------------------------------------ WL
def _brute_wl(edges, n_iter):
    """Dict-based 1-WL twin: degree init, h64_py relabel rounds."""
    from ts2g2_spark.functions.hashing import h64_py

    adj = {}
    for a, b in edges:
        a, b = min(a, b), max(a, b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: len(nbs) for v, nbs in adj.items()}
    for _ in range(n_iter):
        lab = {
            v: h64_py(f"{lab[v]}|"
                      + ",".join(str(x) for x in sorted(lab[u] for u in nbs)))
            for v, nbs in adj.items()
        }
    return lab


def test_wl_kernel_random_graphs():
    from ts2g2_spark.operators.kernels import graph_wl_kernel

    rng = np.random.default_rng(29)
    for trial in range(30):
        m = int(rng.integers(1, 50))
        e = rng.integers(0, 18, size=(m, 2))
        nodes, lab = graph_wl_kernel(e, n_iter=3)
        want = _brute_wl(map(tuple, e.tolist()), 3)
        assert dict(zip(nodes.tolist(), lab.tolist())) == want, trial
    nodes, lab = graph_wl_kernel(np.empty((0, 2), dtype=np.int64))
    assert len(nodes) == 0 and len(lab) == 0
    with pytest.raises(ValueError):
        graph_wl_kernel(np.array([[0, 1]]), n_iter=0)


def _fp_of(edges, n_iter=3):
    from ts2g2_spark.functions.hashing import h64_py
    from ts2g2_spark.operators.kernels import graph_wl_kernel

    _, lab = graph_wl_kernel(np.asarray(edges, np.int64), n_iter=n_iter)
    return h64_py(",".join(str(x) for x in np.sort(lab)))


def test_wl_fingerprint_invariance_and_power():
    # isomorphism invariance: a node-id permutation keeps the fingerprint
    rng = np.random.default_rng(31)
    e = rng.integers(0, 12, size=(25, 2))
    perm = rng.permutation(100)
    assert _fp_of(e) == _fp_of(perm[e])
    # separating power beyond the degree sequence: C4 + K2 vs P6 share
    # the degree multiset {1,1,2,2,2,2} but WL splits them in round 1
    c4_k2 = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5)]
    p6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    assert _fp_of(c4_k2) != _fp_of(p6)
    # documented 1-WL limit: regular graphs of equal degree and size are
    # indistinguishable (C6 vs two triangles both read 2-regular, n=6)
    c6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]
    two_c3 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    assert _fp_of(c6) == _fp_of(two_c3)


def test_wl_relational_matches_fused(spark):
    from ts2g2_spark.operators import graphmetrics
    from ts2g2_spark.operators.kernels import visibility_graph

    rng = np.random.default_rng(37)
    series_rows = [
        (str(k), [float(x) for x in rng.integers(0, 9, 40)])
        for k in range(5)
    ]
    sdf = spark.createDataFrame(
        series_rows, "series_key string, values array<double>")
    fused = {
        r.series_key: (r.n_nodes, r.wl_fp)
        for r in graphmetrics.wl_from_series(
            sdf, kind="horizontal", n_iter=3).collect()
    }
    edge_rows = []
    for key, vals in series_rows:
        e, _ = visibility_graph(np.asarray(vals, float), kind="horizontal")
        edge_rows += [(key, int(a), int(b)) for a, b in e]
    edf = spark.createDataFrame(
        edge_rows, "series_key string, src long, dst long")
    rel = {
        r.series_key: (r.n_nodes, r.wl_fp)
        for r in graphmetrics.wl_fingerprints(edf, n_iter=3).collect()
    }
    assert fused == rel
    with pytest.raises(ValueError):
        graphmetrics.wl_labels(edf, n_iter=0)


@pytest.mark.parametrize("kind", ["horizontal", "natural"])
@pytest.mark.parametrize("min_cn", [1, 2])
def test_fused_link_prediction_bitequal_relational(
    spark, series_df, kind, min_cn
):
    from ts2g2_spark.operators.graphmetrics import (
        link_prediction, link_prediction_from_series,
    )

    edges = graphs.visibility_edges(series_df, kind=kind)
    rel = _sorted_pdf(
        link_prediction(edges, min_cn=min_cn), ["series_key", "u", "v"])
    fus = _sorted_pdf(
        link_prediction_from_series(series_df, kind=kind, min_cn=min_cn),
        ["series_key", "u", "v"])
    assert len(rel), "fixture must produce candidate pairs"
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])


def test_link_prediction_kernel_matches_networkx():
    from ts2g2_spark.operators.kernels import link_prediction_kernel

    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 3), (0, 2), (1, 3), (3, 4),
                      (4, 5), (2, 5)])
    e = np.array(g.edges(), dtype=np.int64)
    u, v, cn, jacc, aa = link_prediction_kernel(e, min_cn=1)
    got = {(int(a), int(b)): (int(c), float(j), float(s))
           for a, b, c, j, s in zip(u, v, cn, jacc, aa)}
    nonedges = list(nx.non_edges(g))
    want_j = {tuple(sorted((a, b))): p
              for a, b, p in nx.jaccard_coefficient(g, nonedges)}
    want_a = {tuple(sorted((a, b))): p
              for a, b, p in nx.adamic_adar_index(g, nonedges)}
    want_c = {tuple(sorted((a, b))): len(list(
        nx.common_neighbors(g, a, b))) for a, b in nonedges}
    want = {k: v for k, v in want_c.items() if v >= 1}
    assert set(got) == set(want)
    for k, (c, j, s) in got.items():
        assert c == want_c[k]
        assert j == pytest.approx(want_j[k], abs=1e-12)
        assert s == pytest.approx(want_a[k], abs=1e-12)


def test_link_prediction_kernel_empty_and_min_cn():
    from ts2g2_spark.operators.kernels import link_prediction_kernel

    u, v, cn, jacc, aa = link_prediction_kernel(
        np.empty((0, 2), dtype=np.int64))
    assert len(u) == 0 and len(jacc) == 0
    # a path graph: every candidate pair has exactly 1 common neighbor
    path = np.array([(i, i + 1) for i in range(5)], dtype=np.int64)
    u1, *_ = link_prediction_kernel(path, min_cn=1)
    u2, *_ = link_prediction_kernel(path, min_cn=2)
    assert len(u1) == 4 and len(u2) == 0
    with pytest.raises(ValueError):
        link_prediction_kernel(path, min_cn=0)


@pytest.mark.parametrize("cap", [2, 3, 5])
def test_link_prediction_hub_cap_bitequal_both_strategies(
    spark, series_df, cap
):
    """Under max_hub_degree both strategies stay bit-identical, and the
    capped candidate set is a subset of the exact one with cn bounded
    by the exact cn (wedges only removed, never added)."""
    from ts2g2_spark.operators.graphmetrics import (
        link_prediction, link_prediction_from_series,
    )

    edges = graphs.visibility_edges(series_df, kind="horizontal")
    rel = _sorted_pdf(
        link_prediction(edges, min_cn=1, max_hub_degree=cap),
        ["series_key", "u", "v"])
    fus = _sorted_pdf(
        link_prediction_from_series(
            series_df, kind="horizontal", min_cn=1, max_hub_degree=cap),
        ["series_key", "u", "v"])
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])
    exact = _sorted_pdf(
        link_prediction(edges, min_cn=1), ["series_key", "u", "v"])
    ex = {(r.series_key, r.u, r.v): r.cn for r in exact.itertuples()}
    for r in rel.itertuples():
        assert (r.series_key, r.u, r.v) in ex
        assert r.cn <= ex[(r.series_key, r.u, r.v)]
    assert len(rel) <= len(exact)


def test_link_prediction_kernel_hub_cap_star():
    """A planted k-star: the hub is the only wedge center, so capping
    below k removes every candidate; capping at k keeps all C(k,2)."""
    from ts2g2_spark.operators.kernels import link_prediction_kernel

    k = 6
    star = np.array([(0, i) for i in range(1, k + 1)], dtype=np.int64)
    u, v, cn, jacc, aa = link_prediction_kernel(star, min_cn=1)
    assert len(u) == k * (k - 1) // 2
    u2, *_ = link_prediction_kernel(star, min_cn=1, max_hub_degree=k - 1)
    assert len(u2) == 0
    u3, *_ = link_prediction_kernel(star, min_cn=1, max_hub_degree=k)
    assert len(u3) == k * (k - 1) // 2
    with pytest.raises(ValueError):
        link_prediction_kernel(star, min_cn=1, max_hub_degree=0)


def test_link_prediction_hub_cap_nontrivial_survivors(spark):
    """A cap that demonstrably KEEPS some candidates (cap=8 on a
    50-point random HVG keeps ~30 of ~1500) — guards against the cap
    parity tests passing trivially on all-empty frames."""
    from ts2g2_spark.operators.graphmetrics import (
        link_prediction, link_prediction_from_series,
    )

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "series_key": ["r1", "r2"],
        "values": [rng.normal(size=50).tolist(),
                   rng.normal(size=40).tolist()],
    })
    df = spark.createDataFrame(pdf)
    edges = graphs.visibility_edges(df, kind="horizontal")
    rel = _sorted_pdf(
        link_prediction(edges, min_cn=1, max_hub_degree=8),
        ["series_key", "u", "v"])
    fus = _sorted_pdf(
        link_prediction_from_series(df, min_cn=1, max_hub_degree=8),
        ["series_key", "u", "v"])
    n_exact = link_prediction(edges, min_cn=1).count()
    assert 0 < len(rel) < n_exact
    pd.testing.assert_frame_equal(rel, fus[rel.columns.tolist()])
