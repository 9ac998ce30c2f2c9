"""Corpus vocabulary / length statistics vs brute-force pandas oracles,
including the exact top-R tournament under tiny bucket counts."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from ts2g2_spark.operators.corpusstats import (
    corpus_length_profile, vocab_stats,
)


def _norm(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
    return [w for w in t.split(" ") if w]


def _docs(seed=7, n=120):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(n):
        src = ["web", "books", "code"][i % 3]
        # skewed zipf-ish draws + punctuation/case noise
        k = rng.integers(3, 40)
        words = rng.choice(vocab, size=k, p=_zipf_p(len(vocab)))
        text = " ".join(words)
        if i % 4 == 0:
            text = text.upper() + "!!! (extra)"
        rows.append((i, text, src, len(text)))
    rows.append((n, "   ", "empty_source", 3))  # normalizes to no words
    return pd.DataFrame(rows, columns=["doc_id", "text", "source",
                                       "n_chars"])


def _zipf_p(v):
    w = 1.0 / np.arange(1, v + 1)
    return w / w.sum()


def _vocab_oracle(pdf, top_r):
    out = {}
    for src, g in pdf.groupby("source"):
        tf = Counter(w for t in g["text"] for w in _norm(t))
        if not tf:
            continue
        n_tokens = sum(tf.values())
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_r]
        xs = [math.log(r + 1) for r in range(len(ranked))]
        ys = [math.log(c) for _, c in ranked]
        slope = None
        if len(ranked) > 1:
            mx, my = np.mean(xs), np.mean(ys)
            den = sum((x - mx) ** 2 for x in xs)
            if den > 0:
                slope = round(
                    sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den, 6)
        hapax = sum(1 for c in tf.values() if c == 1)
        out[src] = (n_tokens, len(tf), hapax,
                    round(len(tf) / n_tokens, 6),
                    round(hapax / len(tf), 6),
                    round(ranked[0][1] / n_tokens, 6), slope)
    return out


@pytest.mark.parametrize("buckets,top_r", [(64, 100), (2, 3)])
def test_vocab_stats_matches_bruteforce(spark, buckets, top_r):
    pdf = _docs()
    got = {r.source: (r.n_tokens, r.vocab, r.hapax, r.ttr, r.hapax_ratio,
                      r.top1_share, r.zipf_slope)
           for r in vocab_stats(spark.createDataFrame(pdf), top_r=top_r,
                                buckets=buckets).collect()}
    want = _vocab_oracle(pdf, top_r)
    assert set(got) == set(want)  # empty_source absent from both
    for src in want:
        for g, w in zip(got[src], want[src]):
            if w is None:
                assert g is None, src
            elif isinstance(w, float):
                assert g == pytest.approx(w, abs=2e-6), src
            else:
                assert g == w, src


def test_vocab_stats_single_word_source_null_slope(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["aaa aaa", "aaa"],
                        "source": ["s", "s"], "n_chars": [7, 3]})
    r = vocab_stats(spark.createDataFrame(pdf)).collect()[0]
    assert (r.n_tokens, r.vocab, r.hapax) == (3, 1, 0)
    assert r.ttr == pytest.approx(1 / 3, abs=1e-6)
    assert r.top1_share == 1.0 and r.zipf_slope is None


def test_vocab_stats_bad_params_raise(spark):
    with pytest.raises(ValueError):
        vocab_stats(None, top_r=1)


def test_length_profile_matches_bruteforce(spark):
    pdf = _docs(seed=3)
    got = {r.source: r for r in corpus_length_profile(
        spark.createDataFrame(pdf), short_chars=80).collect()}
    for src, g in pdf.groupby("source"):
        x = g["n_chars"].to_numpy()
        r = got[src]
        assert r.n_docs == len(x) and r.total_chars == x.sum()
        assert r.mean_chars == pytest.approx(x.mean(), abs=2e-6)
        q = np.quantile(x, [0.1, 0.25, 0.5, 0.75, 0.9])
        for gq, wq in zip((r.p10, r.p25, r.p50, r.p75, r.p90), q):
            assert gq == pytest.approx(wq, abs=2e-6), src
        assert r.short_frac == pytest.approx((x < 80).mean(), abs=2e-6)


def test_source_divergence_matches_python_model(spark):
    """KL(source || corpus) vs a literal Counter model; a source that IS
    the corpus mixture scores 0 bits (canonical +0.0)."""
    import collections
    import math

    import pandas as pd

    from ts2g2_spark.operators.corpusstats import source_divergence

    docs = [
        (1, "mono", "alpha alpha alpha alpha"),
        (2, "mix", "alpha beta gamma delta"),
        (3, "mix", "beta beta gamma alpha"),
        (4, "solo", "zeta"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "source", "text"])
    got = {r["source"]: r for r in source_divergence(
        spark.createDataFrame(pdf)).collect()}

    tf: dict[str, collections.Counter] = {}
    for _, src, text in docs:
        tf.setdefault(src, collections.Counter()).update(text.split())
    corpus = collections.Counter()
    for c in tf.values():
        corpus.update(c)
    big_n = sum(corpus.values())
    for src, c in tf.items():
        n = sum(c.values())
        kl = sum(
            (v / n) * math.log2((v / n) / (corpus[w] / big_n))
            for w, v in c.items()
        )
        r = got[src]
        assert r["n_tokens"] == n
        assert r["n_types"] == len(c)
        assert abs(r["kl_bits"] - kl) < 1e-6, src
        assert math.copysign(1.0, r["kl_bits"]) == 1.0  # never -0.0

    # single-source corpus degenerates to exactly 0 bits
    one = pdf[pdf["source"] == "mix"]
    z = source_divergence(spark.createDataFrame(one)).collect()
    assert all(r["kl_bits"] == 0.0 for r in z)


def test_heaps_law_matches_numpy_reference(spark):
    """heaps_law == a straight numpy replay of the same pipeline
    (cumulative tokens/vocab in doc order, ln-ln OLS)."""
    from ts2g2_spark.operators.corpusstats import heaps_law

    rng = np.random.default_rng(11)
    # open-ended vocabulary: doc i introduces new words w_{i*3..}
    docs = []
    for i in range(40):
        ws = [f"w{j}" for j in rng.integers(0, 3 * (i + 1), size=20)]
        docs.append((i, " ".join(ws)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    out = heaps_law(spark.createDataFrame(pdf)).collect()[0]

    seen, ct, xs, ys = set(), 0, [], []
    for _, r in pdf.sort_values("doc_id").iterrows():
        toks = r.text.split()
        ct += len(toks)
        seen |= set(toks)
        if ct > 0:
            xs.append(math.log(ct))
            ys.append(math.log(len(seen)))
    x, y = np.array(xs), np.array(ys)
    m = len(x)
    beta = ((m * (x * y).sum() - x.sum() * y.sum())
            / (m * (x * x).sum() - x.sum() ** 2))
    k = math.exp((y.sum() - beta * x.sum()) / m)
    assert out["n_docs"] == 40 and out["n_tokens"] == 800
    assert out["vocab"] == len(seen)
    assert out["heaps_beta"] == pytest.approx(beta, abs=2e-6)
    assert out["heaps_k"] == pytest.approx(k, abs=2e-6)
    assert 0.0 < out["heaps_beta"] < 1.0 and out["r2"] > 0.9


def test_heaps_law_bucket_invariance_and_edges(spark):
    """The two-pass prefix sum is exact: any n_buckets gives identical
    output; empty/degenerate corpora yield NULL fits, not errors."""
    from ts2g2_spark.operators.corpusstats import heaps_law

    pdf = pd.DataFrame({
        "doc_id": range(12),
        "text": [f"a b w{i} w{i} x{i // 2}" for i in range(12)],
    })
    sdf = spark.createDataFrame(pdf)
    rows = [heaps_law(sdf, n_buckets=nb).collect()[0]
            for nb in (1, 3, 256)]
    assert rows[0] == rows[1] == rows[2]

    # empty corpus: one row, NULL fit
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = heaps_law(empty).collect()[0]
    assert r["heaps_beta"] is None and r["n_docs"] == 0

    # single doc: one prefix point -> nx < 2 -> NULL fit, counts real
    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": ["a b a"]}))
    r1 = heaps_law(one).collect()[0]
    assert r1["n_tokens"] == 3 and r1["vocab"] == 2
    assert r1["heaps_beta"] is None

    # all-empty texts: curve filtered to nothing -> NULL fit
    blank = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["", "  "]}))
    rb = heaps_law(blank).collect()[0]
    assert rb["heaps_beta"] is None and rb["n_docs"] == 2


def _auc_bruteforce(scores, labels):
    """Pair-counting AUC: P(s_pos > s_neg) + P(equal)/2 over all
    (pos, neg) pairs."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0
               for p in pos for q in neg)
    return wins / (len(pos) * len(neg))


@pytest.mark.parametrize("grouped", [False, True])
def test_auc_score_matches_pair_counting(spark, grouped):
    """Rank-sum AUC == brute-force pair counting, with heavy ties and
    per-group evaluation."""
    from ts2g2_spark.operators.corpusstats import auc_score

    rng = np.random.default_rng(11)
    n = 240
    fold = rng.integers(0, 3, size=n)
    # quantized scores -> many ties; label loosely correlated with score
    score = np.round(rng.normal(size=n), 1)
    label = (score + rng.normal(scale=1.5, size=n) > 0).astype(int)
    pdf = pd.DataFrame({"fold": fold, "s": score, "y": label})
    sdf = spark.createDataFrame(pdf)

    g = ("fold",) if grouped else ()
    out = {tuple(r[c] for c in g): r
           for r in auc_score(sdf, "s", "y", group_cols=g).collect()}
    groups = pdf.groupby(list(g)) if grouped else [((), pdf)]
    for key, gdf in groups:
        key = key if isinstance(key, tuple) else (key,)
        want = _auc_bruteforce(gdf["s"].tolist(), gdf["y"].tolist())
        row = out[key if grouped else ()]
        assert row["n_pos"] == int(gdf["y"].sum())
        assert row["n_neg"] == int((1 - gdf["y"]).sum())
        assert row["auc"] == pytest.approx(want, abs=1e-6)


def test_auc_score_edges(spark):
    """Degenerate classes -> NULL; perfect separation -> 1.0; constant
    score -> 0.5 exactly (all ties)."""
    from ts2g2_spark.operators.corpusstats import auc_score

    one_class = spark.createDataFrame(
        pd.DataFrame({"s": [0.1, 0.2, 0.3], "y": [1, 1, 1]}))
    assert auc_score(one_class, "s", "y").collect()[0]["auc"] is None

    perfect = spark.createDataFrame(
        pd.DataFrame({"s": [0.0, 1.0, 2.0, 3.0], "y": [0, 0, 1, 1]}))
    assert auc_score(perfect, "s", "y").collect()[0]["auc"] == 1.0

    const = spark.createDataFrame(
        pd.DataFrame({"s": [7.0] * 6, "y": [0, 1, 0, 1, 1, 0]}))
    assert auc_score(const, "s", "y").collect()[0]["auc"] == 0.5
