"""Graph-metric operators (degrees / summary / triangles / clustering /
PageRank) vs networkx and a numpy power-iteration model with the same
per-iteration rounding contract."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from ts2g2_spark.operators.graphmetrics import (
    clustering_coefficients, degrees, graph_summary, pagerank,
    triangle_counts,
)


def _edge_df(spark, graphs):
    """graphs: {series_key: iterable of (u, v)} -> edge frame, with noisy
    duplicates / reversed duplicates / self-loops the operators must
    collapse (matching nx.Graph insert semantics)."""
    rows = []
    for key, edges in graphs.items():
        for u, v in edges:
            rows.append((key, u, v, 1.0))
            rows.append((key, v, u, 1.0))  # reversed duplicate
        if edges:
            u0 = edges[0][0]
            rows.append((key, u0, u0, 1.0))  # self-loop (dropped)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["series_key", "src", "dst", "weight"])
    )


GRAPHS = {
    "tri": [(0, 1), (1, 2), (0, 2)],                      # one triangle
    "path": [(0, 1), (1, 2), (2, 3)],                     # no triangle
    "k4": [(a, b) for a in range(4) for b in range(a + 1, 4)],
    "star": [(0, i) for i in range(1, 6)],
    "two_tri": [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)],
    "rand": [
        (int(u), int(v))
        for u, v in np.random.default_rng(7).integers(0, 30, (120, 2))
        if u != v
    ],
}


def _nx(graphs):
    out = {}
    for key, edges in graphs.items():
        g = nx.Graph()
        g.add_edges_from(edges)
        out[key] = g
    return out


@pytest.fixture(scope="module")
def edge_df(spark):
    return _edge_df(spark, GRAPHS).cache()


def test_degrees_match_networkx(spark, edge_df):
    got = {
        (r.series_key, r.node): r.degree
        for r in degrees(edge_df).collect()
    }
    for key, g in _nx(GRAPHS).items():
        for node, deg in g.degree():
            assert got[(key, node)] == deg
    assert len(got) == sum(g.number_of_nodes() for g in _nx(GRAPHS).values())


def test_summary_matches_networkx(spark, edge_df):
    got = {r.series_key: r for r in graph_summary(edge_df).collect()}
    for key, g in _nx(GRAPHS).items():
        r = got[key]
        assert r.n_nodes == g.number_of_nodes()
        assert r.n_edges == g.number_of_edges()
        assert r.density == pytest.approx(nx.density(g), abs=1e-9)
        degs = [d for _, d in g.degree()]
        assert r.max_degree == max(degs)
        assert r.avg_degree == pytest.approx(np.mean(degs), abs=1e-9)


def test_triangles_match_networkx(spark, edge_df):
    got = {
        (r.series_key, r.node): r.triangles
        for r in triangle_counts(edge_df).collect()
    }
    for key, g in _nx(GRAPHS).items():
        for node, t in nx.triangles(g).items():
            assert got.get((key, node), 0) == t, (key, node)
    # sparse form: zero-triangle nodes are absent
    assert all(t > 0 for t in got.values())


def test_clustering_matches_networkx(spark, edge_df):
    got = {
        (r.series_key, r.node): r
        for r in clustering_coefficients(edge_df).collect()
    }
    for key, g in _nx(GRAPHS).items():
        cc = nx.clustering(g)
        tri = nx.triangles(g)
        for node in g.nodes():
            r = got[(key, node)]
            assert r.lcc == pytest.approx(cc[node], abs=1e-8)
            assert r.triangles == tri[node]
            assert r.degree == g.degree(node)


def _pagerank_model(g: nx.Graph, iters: int, d: float, dp: int):
    """The operator's documented contract: power iteration with
    per-iteration decimal rounding (np.round half-even matches both
    Spark's ROUND HALF_UP only at non-boundary values — boundary values
    are astronomically unlikely for irrational rank sums, and the test
    compares with 1e-9 tolerance anyway)."""
    nodes = sorted(g.nodes())
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    deg = np.array([g.degree(v) for v in nodes], float)
    r = np.round(np.full(n, 1.0 / n), dp)
    for _ in range(iters):
        inflow = np.zeros(n)
        for u, v in g.edges():
            inflow[idx[v]] += r[idx[u]] / deg[idx[u]]
            inflow[idx[u]] += r[idx[v]] / deg[idx[v]]
        r = np.round((1.0 - d) / n + d * inflow, dp)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_model_and_sums_to_one(spark, edge_df):
    got = {}
    for r in pagerank(edge_df, iters=8, damping=0.85).collect():
        got[(r.series_key, r.node)] = r.rank
    for key, g in _nx(GRAPHS).items():
        model = _pagerank_model(g, iters=8, d=0.85, dp=9)
        for node, exp in model.items():
            assert got[(key, node)] == pytest.approx(exp, abs=2e-9), (
                key, node)
        total = sum(v for (k, _), v in got.items() if k == key)
        assert total == pytest.approx(1.0, abs=1e-5)


def test_pagerank_close_to_converged_fixpoint(spark, edge_df):
    """More iterations should approach the converged PageRank fixpoint
    (the unrounded power-iteration limit; nx.pagerank needs scipy,
    absent here — the dp=15 model is the same algorithm run to
    convergence).  Tolerance follows the geometric convergence rate
    (d^40 = 0.85^40 ~ 1.5e-3).  Also exercises the >=checkpoint_every
    lineage-cut path (40 iterations would exhaust task memory as one
    plan)."""
    got = {
        (r.series_key, r.node): r.rank
        for r in pagerank(edge_df, iters=40, damping=0.85).collect()
    }
    for key, g in _nx(GRAPHS).items():
        ref = _pagerank_model(g, iters=200, d=0.85, dp=15)
        for node, exp in ref.items():
            assert got[(key, node)] == pytest.approx(exp, abs=2e-3)


def test_degree_exponent_matches_bruteforce(spark):
    """Clauset MLE from the relational degree frame equals the direct
    numpy computation per graph; an i.i.d.-noise HVG's exponent lands
    in the literature's exponential-tail regime (alpha well above the
    ~3.3 of ln(3/2)-rate tails is not expected — sanity-band only)."""
    import numpy as np
    import pandas as pd

    from ts2g2_spark.operators import graphmetrics, graphs

    rng = np.random.default_rng(29)
    series = {
        "noise": rng.normal(size=400).tolist(),
        "ramp": np.arange(60.0).tolist(),
        "tiny": [2.0, 1.0],
    }
    sdf = spark.createDataFrame(pd.DataFrame(
        {"series_key": list(series), "values": list(series.values())}))
    edges = graphs.visibility_edges(sdf, kind="horizontal")
    got = {r.series_key: r for r in
           graphmetrics.degree_exponent(edges).collect()}
    degs = graphmetrics.degrees(edges).toPandas()
    for key in series:
        d = degs[degs.series_key == key]["degree"].to_numpy(float)
        alpha = 1.0 + len(d) / (np.log(d).sum()
                                - len(d) * np.log(d.min() - 0.5))
        r = got[key]
        assert r.n_nodes == len(d)
        assert r.dmin == d.min()
        assert r.alpha == pytest.approx(round(alpha, 6), abs=2e-6), key
    # 2-node graph: both degrees 1 -> alpha = 1 + 2/(2*ln2)
    assert got["tiny"].alpha == pytest.approx(
        1.0 + 2.0 / (2.0 * np.log(2.0)), abs=2e-6)


def test_link_prediction_matches_networkx(spark, edge_df):
    from ts2g2_spark.operators.graphmetrics import link_prediction

    out = link_prediction(edge_df)
    got = {(r.series_key, r.u, r.v): (r.cn, r.jaccard, r.adamic_adar)
           for r in out.collect()}
    want = {}
    for key, g in _nx(GRAPHS).items():
        # every non-edge pair with >= 1 common neighbor
        pairs = [(u, v) for u in g for v in g
                 if u < v and not g.has_edge(u, v)
                 and len(list(nx.common_neighbors(g, u, v))) > 0]
        for u, v, j in nx.jaccard_coefficient(g, pairs):
            want.setdefault((key, u, v), {})["j"] = j
        for u, v, a in nx.adamic_adar_index(g, pairs):
            want[(key, u, v)]["a"] = a
        for u, v in pairs:
            want[(key, u, v)]["cn"] = len(
                list(nx.common_neighbors(g, u, v)))
    assert set(got) == set(want)
    for k, (cn, j, a) in got.items():
        assert cn == want[k]["cn"]
        assert j == pytest.approx(want[k]["j"], abs=1e-6)
        assert a == pytest.approx(want[k]["a"], abs=1e-6)


def test_link_prediction_edges(spark):
    from ts2g2_spark.operators.graphmetrics import link_prediction

    # a single edge: no wedge, no candidates
    one = _edge_df(spark, {"e": [(0, 1)]})
    assert link_prediction(one).count() == 0
    # path 0-1-2: exactly one prediction (0,2) through hub 1 (deg 2)
    path = _edge_df(spark, {"p": [(0, 1), (1, 2)]})
    rows = link_prediction(path).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.u, r.v, r.cn) == (0, 2, 1)
    assert r.jaccard == 1.0           # cn=1, du=dv=1, union=1
    assert r.adamic_adar == round(1.0 / np.log(2.0), 6)
    # empty frame
    empty = spark.createDataFrame(
        [], "series_key string, src long, dst long, weight double")
    assert link_prediction(empty).count() == 0
