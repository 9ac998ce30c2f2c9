"""Linking operators (SURVEY §2.4, L1-L12) vs the reference strategies.

Each test builds the same graphs the reference operates on (NetworkX,
driver-side — test-only), runs the reference linking strategy as oracle,
and compares edge sets (and weights where defined) against the engine's
DataFrame operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ts2g2_spark.operators import linking

NODE_SCHEMA = ("graph_key string, node_id string, ord long, value double, "
               "values array<double>")


def _nx():
    import networkx as nx

    return nx


def _node_frame(spark, graphs):
    """dict[graph_key -> nx.Graph] -> node frame (insertion order = ord)."""
    rows = []
    for gk, g in graphs.items():
        for i, (nid, attrs) in enumerate(g.nodes(data=True)):
            vals = attrs.get("timeseries")
            rows.append((
                gk, str(nid), i,
                float(attrs["value"][0]) if "value" in attrs else float("nan"),
                [float(v) for v in vals] if vals is not None else [],
            ))
    return spark.createDataFrame(rows, NODE_SCHEMA)


def _added_edges(before, after):
    """Canonicalized (src<=dst) edges present in `after` but not `before`."""
    b = {tuple(sorted(map(str, e))) for e in before}
    return {tuple(sorted(map(str, e))) for e in after.edges()} - b


# ------------------------------------------------------------------ L1
def test_seasonality_parity(spark, reference):
    from to_graph.strategy_linking_graph import (
        StrategyLinkingGraphBySeasonalities,
    )

    nx = _nx()
    g = nx.Graph()
    for i in range(10):
        g.add_node(f"n{i}")
    g.add_edges_from([(f"n{i}", f"n{i+1}") for i in range(9)])
    before = list(g.edges())

    strat = StrategyLinkingGraphBySeasonalities(3)
    strat.set_graph(g)
    ref_added = _added_edges(before, strat.apply(True))

    nodes = _node_frame(spark, {"g": g})
    got = {tuple(sorted((r.src, r.dst)))
           for r in linking.link_seasonality(nodes, 3).collect()}
    # reference adds (i, i+3) for i in range(len-3); lead(3) emits the same
    assert got == {tuple(sorted((f"n{i}", f"n{i+3}"))) for i in range(7)}
    assert ref_added <= got  # ref set excludes pairs already path-linked


# ------------------------------------------------------------------ L2
def test_value_within_range_parity(spark, reference):
    from to_graph.strategy_linking_graph import (
        StrategyLinkingGraphByValueWithinRange,
    )

    nx = _nx()
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 5, size=12)
    g = nx.Graph()
    for i, v in enumerate(vals):
        g.add_node(f"n{i}", value=[float(v)])
    before = list(g.edges())

    strat = StrategyLinkingGraphByValueWithinRange(0.8)
    strat.set_graph(g)
    ref_added = _added_edges(before, strat.apply(True))

    nodes = _node_frame(spark, {"g": g})
    got = {tuple(sorted((r.src, r.dst)))
           for r in linking.link_value_within_range(nodes, 0.8).collect()}
    assert got == ref_added


# ------------------------------------------------------------------ L3
def test_correlation_parity(spark, reference):
    from to_graph.strategy_linking_multi_graphs import (
        PearsonCorrelation,
        StrategyLinkingGraphsByCorrelation,
    )

    nx = _nx()
    rng = np.random.default_rng(11)
    graphs = {}
    series = {}
    for k in range(4):
        ts = pd.Series(rng.normal(size=30))
        g = nx.Graph()
        g.add_node(f"s{k}", timeseries=ts)
        graphs[f"h{k}"] = g
        series[f"s{k}"] = ts

    strat = StrategyLinkingGraphsByCorrelation(None, PearsonCorrelation())
    strat.set_graphs(graphs, None, None)
    ref_g, _ = strat.apply()
    ref = {tuple(sorted((str(a), str(b)))): w["weight"]
           for a, b, w in ref_g.edges(data=True)}

    nodes = _node_frame(spark, graphs)
    got = {tuple(sorted((r.src, r.dst))): r.weight
           for r in linking.link_correlation(nodes).collect()}
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12)


# ------------------------------------------------------------------ L5
def test_time_cooccurrence_parity(spark, reference):
    from to_graph.strategy_linking_multi_graphs import (
        StrategyLinkingMultipleGraphsByTimeCooccurrence,
    )

    nx = _nx()
    graphs = {}
    for k, n in (("ha", 5), ("hb", 4), ("hc", 3)):
        g = nx.Graph()
        for i in range(n):
            g.add_node(f"{k}_n{i}")
        graphs[k] = g

    strat = StrategyLinkingMultipleGraphsByTimeCooccurrence(None)
    strat.set_graphs(graphs, None, None)
    ref_g, _ = strat.apply()
    ref = _added_edges([], ref_g)

    nodes = _node_frame(spark, graphs)
    got = {tuple(sorted((r.src, r.dst)))
           for r in linking.link_time_cooccurrence(nodes).collect()}
    assert got == ref


# ------------------------------------------------------------------ L6
def test_positional_correlation_parity(spark, reference):
    from to_graph.strategy_linking_multi_graphs import (
        PearsonCorrelation,
        StrategyLinkingMultipleGraphsByPositionalCorrelationSlidingWindow,
    )

    nx = _nx()
    rng = np.random.default_rng(13)
    graphs = {}
    for k in ("ha", "hb"):
        g = nx.Graph()
        for i in range(3):
            g.add_node(f"{k}_n{i}",
                       timeseries=pd.Series(rng.normal(size=20)))
        graphs[k] = g

    strat = StrategyLinkingMultipleGraphsByPositionalCorrelationSlidingWindow(
        None, PearsonCorrelation())
    strat.set_graphs(graphs, None, None)
    ref_g, _ = strat.apply()
    ref = {tuple(sorted((str(a), str(b)))): w.get("weight")
           for a, b, w in ref_g.edges(data=True)}

    nodes = _node_frame(spark, graphs)
    got = {tuple(sorted((r.src, r.dst))): r.weight
           for r in linking.link_positional_correlation(nodes).collect()}
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12)


# ------------------------------------------------------------------ L7
def test_sliding_window_chain_parity(spark, reference):
    from to_graph.strategy_linking_multi_graphs import (
        StrategyLinkingMultipleGraphsSlidingWindow,
    )

    nx = _nx()
    # two variables, 4 and 3 window-graphs
    graphs, order = [], []
    obj2id = {}
    for j, n in enumerate((4, 3)):
        d, o = {}, []
        for i in range(n):
            g = nx.Graph()
            g.add_edge(f"v{j}w{i}_a", f"v{j}w{i}_b")
            h = f"hash_{j}_{i}"
            d[h] = g
            o.append(h)
            obj2id[id(g)] = h
        graphs.append(d)
        order.append(o)

    strat = StrategyLinkingMultipleGraphsSlidingWindow(None, None)
    strat.set_graphs(graphs, order, None)
    ref_g, _ = strat.apply()
    ref = {tuple(sorted((obj2id[id(a)], obj2id[id(b)])))
           for a, b in ref_g.edges()}

    rows = [(f"var{j}", i, f"hash_{j}_{i}")
            for j, n in enumerate((4, 3)) for i in range(n)]
    segs = spark.createDataFrame(
        rows, "series_key string, seg_ord long, graph_id string")
    got = {tuple(sorted((r.src, r.dst)))
           for r in linking.link_sliding_window_chain(segs).collect()}
    assert got == ref


# ------------------------------------------------------------------ L8
def test_dtw_parity(spark, reference):
    from to_graph.strategy_linking_multi_graphs import (
        StrategyLinkingMultipleGraphsDynamicTimeWarping,
    )

    nx = _nx()
    rng = np.random.default_rng(17)
    s1 = pd.Series(rng.normal(size=18))
    s2 = pd.Series(rng.normal(size=22))

    def mk(key, n):
        g = nx.Graph()
        for i in range(n):
            g.add_node(f"{key}:{i}", order=i)
        return g

    g1, g2 = mk("a", len(s1)), mk("b", len(s2))
    strat = StrategyLinkingMultipleGraphsDynamicTimeWarping(None)
    strat.set_graphs([{"h1": g1}, {"h2": g2}], None, [[s1], [s2]])
    ref_g, _ = strat.apply()
    ref = {tuple(sorted((str(a), str(b)))) for a, b in ref_g.edges()}

    series = spark.createDataFrame(
        [("a", s1.tolist()), ("b", s2.tolist())],
        "series_key string, values array<double>")
    got = {tuple(sorted((r.src, r.dst)))
           for r in linking.link_dtw(series).collect()}
    assert got == ref


def test_dtw_kernel_matches_stub(reference):
    """Engine DTW DP == the conftest dtaidistance stub on random pairs."""
    from dtaidistance import dtw as stub

    rng = np.random.default_rng(3)
    for n, m in ((5, 8), (20, 20), (31, 17)):
        a, b = rng.normal(size=n), rng.normal(size=m)
        _, paths = stub.warping_paths(a, b)
        assert linking.dtw_path(a, b) == stub.best_path(paths)


# ------------------------------------------------------------------ L10
def test_manual_edge(spark):
    nodes = spark.createDataFrame(
        [("g", f"n{i}", i, float(i), []) for i in range(5)], NODE_SCHEMA)
    got = linking.manual_edge(nodes, 1, 3, weight=2.5).collect()
    assert [(r.src, r.dst, r.weight) for r in got] == [("n1", "n3", 2.5)]


# ------------------------------------------------------------------ L11
def test_reference_combine_identical_nodes_is_noop(reference):
    """core/model.py:326-337 tests `(node, attrs) not in graph` — always
    true — so the reference method never merges anything.  Pin that fact
    so the engine's documented-intent implementation is a deliberate,
    recorded divergence."""
    nx = _nx()
    g = nx.Graph()
    g.add_node("a", value=[1.0])
    g.add_node("b", value=[1.0])
    g.add_edge("a", "b")
    tg = reference.model.TimeGraph(g)
    tg.combine_identical_nodes()
    assert set(tg.graph.nodes) == {"a", "b"}


def test_combine_identical_nodes_engine(spark):
    nodes = spark.createDataFrame(
        [
            ("g", "n0", 0, 1.0, [1.0]),
            ("g", "n1", 1, 2.0, [2.0]),
            ("g", "n2", 2, 1.0, [1.5]),
        ],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [("n0", "n1", None, "x"), ("n1", "n2", None, "x")],
        "src string, dst string, weight double, binding string",
    )
    merged, e = linking.combine_identical_nodes(nodes, edges)
    m = {r.node_id: r for r in merged.collect()}
    assert set(m) == {"n0", "n1"}
    assert m["n0"].values == [1.0, 1.5]  # positional value-list append
    got = {(r.src, r.dst) for r in e.collect()}
    assert got == {("n0", "n1")}  # both edges collapse onto the canonical


# ------------------------------------------------------------------ L12
def test_combine_identical_subgraphs_engine(spark):
    """Identical window-graphs (same fingerprint) merge onto the first
    seg_ord; chain edges rewritten, self-loops dropped (ref
    core/model.py:289-321 semantics over md5-identical subgraphs)."""
    segs = spark.createDataFrame(
        [
            ("s", 0, "gA", "fp1"),
            ("s", 1, "gB", "fp2"),
            ("s", 2, "gC", "fp1"),  # identical to gA
        ],
        "series_key string, seg_ord long, graph_id string, fingerprint string",
    )
    chain = spark.createDataFrame(
        [("gA", "gB", None, "sliding window"),
         ("gB", "gC", None, "sliding window")],
        "src string, dst string, weight double, binding string",
    )
    merged, e = linking.combine_identical_subgraphs(segs, chain)
    m = {r.graph_id: r for r in merged.collect()}
    assert set(m) == {"gA", "gB"}
    assert m["gA"].merged_seg_ords == [0, 2]
    got = {(r.src, r.dst) for r in e.collect()}
    assert got == {("gA", "gB")}


# ---------------------------------------------------------- L8 banded DTW
def test_dtw_band_inf_equals_exact():
    rng = np.random.default_rng(7)
    for _ in range(5):
        a = rng.normal(size=40)
        b = rng.normal(size=35)
        exact = linking.dtw_path(a, b)
        assert linking.dtw_path(a, b, band=max(len(a), len(b))) == exact


def test_dtw_band_is_valid_path():
    """A narrow band still yields a monotone contiguous warping path from
    (0,0) to (n-1,m-1)."""
    rng = np.random.default_rng(8)
    a = rng.normal(size=60)
    b = rng.normal(size=60)
    p = linking.dtw_path(a, b, band=3)
    assert p[0] == (0, 0) and p[-1] == (59, 59)
    for (i1, j1), (i2, j2) in zip(p, p[1:]):
        assert (i2 - i1, j2 - j1) in {(0, 1), (1, 0), (1, 1)}


def test_link_dtw_band_param(spark):
    s = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0, 2.0]), ("b", [1.0, 3.0, 2.0, 2.0])],
        "series_key string, values array<double>")
    exact = {(r.src, r.dst) for r in linking.link_dtw(s).collect()}
    banded = {(r.src, r.dst) for r in linking.link_dtw(s, band=4).collect()}
    assert exact == banded and exact


def test_dtw_band_too_narrow_raises():
    rng = np.random.default_rng(5)
    a = rng.normal(size=10)
    b = rng.normal(size=100)
    with pytest.raises(ValueError, match="too narrow"):
        linking.dtw_path(a, b, band=2)
    # a sufficient band still works on the same unequal lengths
    p = linking.dtw_path(a, b, band=15)
    assert p[0] == (0, 0) and p[-1] == (9, 99)


def test_dtw_empty_series_raises():
    with pytest.raises(ValueError, match="empty series"):
        linking.dtw_path(np.array([]), np.array([1.0, 2.0]))


def test_link_cross_correlation_best_lag(spark):
    """Planted lag structure: series B is A shifted by +2 with noise, C
    is anti-correlated at lag 0; brute-force numpy model must agree on
    (lag, weight) per pair, including the (|r| desc, lag asc)
    tie-break on rounded r."""
    import numpy as np
    import pandas as pd

    from ts2g2_spark.operators.linking import link_cross_correlation

    rng = np.random.default_rng(13)
    base = np.cumsum(rng.normal(size=40))
    a = base
    b = np.concatenate([rng.normal(size=2), base])[:40] \
        + rng.normal(scale=1e-3, size=40)
    c = -base + rng.normal(scale=1e-3, size=40)
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": ["A", "B", "C"],
        "values": [a.tolist(), b.tolist(), c.tolist()],
    }))
    got = {(r.src, r.dst): (r.lag, r.weight, r.binding)
           for r in link_cross_correlation(nodes, max_lag=3).collect()}

    def model(x, y, max_lag=3, min_overlap=3):
        best = None
        for lag in range(-max_lag, max_lag + 1):
            t0, t1 = max(0, -lag), min(len(x), len(y) - lag)
            if t1 - t0 < min_overlap:
                continue
            r = np.corrcoef(x[t0:t1], y[t0 + lag:t1 + lag])[0, 1]
            w = 0.0 if np.isnan(r) else float(np.round(r, 6)) + 0.0
            key = (-abs(w), lag)
            if best is None or key < best[:2]:
                best = (-abs(w), lag, w)
        return best[1], best[2]

    series = {"A": a, "B": b, "C": c}
    for (s, d), (lag, w, binding) in got.items():
        ml, mw = model(series[s], series[d])
        assert (lag, w) == (ml, mw), (s, d)
        assert binding == "xcorr"
    # planted structure recovered: B lags A by 2; C anti-correlates at 0
    assert got[("A", "B")][0] == 2
    assert got[("A", "C")][0] == 0 and got[("A", "C")][1] < -0.99


def test_link_cross_correlation_validation_and_edges(spark):
    import pandas as pd
    import pytest as _pytest

    from ts2g2_spark.operators.linking import link_cross_correlation

    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": ["A", "B"], "values": [[1.0, 2.0], [2.0, 1.0]]}))
    with _pytest.raises(ValueError):
        link_cross_correlation(nodes, max_lag=-1)
    with _pytest.raises(ValueError):
        link_cross_correlation(nodes, min_overlap=1)
    # series too short for min_overlap at every lag -> pair dropped
    assert link_cross_correlation(nodes, max_lag=0,
                                  min_overlap=3).count() == 0
    # constant series: zero variance -> weight 0.0 at the lag-asc tie
    flat = spark.createDataFrame(pd.DataFrame({
        "node_id": ["A", "B"],
        "values": [[1.0] * 6, [1.0] * 6]}))
    rows = link_cross_correlation(flat, max_lag=1).collect()
    assert len(rows) == 1
    assert rows[0].weight == 0.0 and rows[0].lag == -1


# ---------------------------------------------------------- L3 Spearman
def _spearman_brute(a, b):
    """Pure-numpy tie-aware Spearman over the common prefix (scipy-free)."""
    n = min(len(a), len(b))
    if n < 2:
        return 0.0
    a, b = np.asarray(a[:n], float), np.asarray(b[:n], float)

    def avg_ranks(x):
        order = np.argsort(x, kind="stable")
        ranks = np.empty(n, float)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and x[order[j + 1]] == x[order[i]]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    ra, rb = avg_ranks(a), avg_ranks(b)
    da, db = ra - ra.mean(), rb - rb.mean()
    va, vb = (da * da).sum(), (db * db).sum()
    if va <= 0 or vb <= 0:
        return 0.0
    return float((da * db).sum() / np.sqrt(va) / np.sqrt(vb))


def test_link_spearman_brute_parity(spark):
    rng = np.random.default_rng(7)
    # heavy ties (integers from a small domain) + one monotone pair
    vals = {
        "A": rng.integers(0, 6, size=25).astype(float).tolist(),
        "B": rng.integers(0, 6, size=31).astype(float).tolist(),
        "C": list(range(25)),
        "D": [float(x * x) for x in range(25)],   # rank-identical to C
        "E": [3.0] * 25,                          # constant -> weight 0
    }
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": list(vals), "values": list(vals.values())}))
    got = {(r.src, r.dst): r.weight
           for r in linking.link_spearman(nodes).collect()}
    keys = sorted(vals)
    assert set(got) == {(x, y) for i, x in enumerate(keys)
                        for y in keys[i + 1:]}
    for (x, y), w in got.items():
        assert w == pytest.approx(_spearman_brute(vals[x], vals[y]),
                                  abs=1e-12), (x, y)
    # monotone transform invariance: exactly 1.0, not approximately
    assert got[("C", "D")] == 1.0
    assert all(got[(k, "E")] == 0.0 for k in "ABCD")


def test_link_spearman_outlier_robustness(spark):
    # one spike wrecks Pearson but leaves Spearman near 1
    base = list(range(20))
    spiked = base[:-1] + [10000.0]
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": ["x", "y"],
        "values": [[float(v) for v in base], [float(v) for v in spiked]]}))
    sp = linking.link_spearman(nodes).collect()[0].weight
    assert sp == 1.0  # ranks unchanged by the spike
    assert sp == pytest.approx(_spearman_brute(base, spiked), abs=1e-12)
    short = spark.createDataFrame(pd.DataFrame({
        "node_id": ["x", "y"], "values": [[1.0], [2.0]]}))
    assert linking.link_spearman(short).collect()[0].weight == 0.0


def test_link_spearman_empty_prefix_pair_kept(spark):
    # empty common prefix: pair must appear with weight 0.0 (NaN -> 0
    # convention), not vanish
    deg = spark.createDataFrame(pd.DataFrame({
        "node_id": ["a", "b"], "values": [[], [1.0, 2.0]]}))
    rows = linking.link_spearman(deg).collect()
    assert len(rows) == 1
    assert rows[0].src == "a" and rows[0].weight == 0.0
