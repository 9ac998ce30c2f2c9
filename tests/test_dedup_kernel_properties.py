"""Property tests pinning the round-3 BATCH-VECTORIZED text kernels
(simhash_fingerprints, shingles_hashed_md5_kernel) against straightforward
per-document reference models — the per-doc loops the vectorized code
replaced.  Texts are drawn adversarially: empty/None, whitespace-only,
NBSP and other non-ASCII, repeated words (tf ties), single-word docs,
docs shorter than the shingle width.

The kernels are exercised OUTSIDE Spark (their inner `kern` generators fed
pandas batches directly) so hypothesis can run hundreds of cases without
JVM round-trips; the Spark plumbing is covered by tests/test_dedup.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from ts2g2_spark.functions.hashing import h64_py


@pytest.fixture(scope="module", autouse=True)
def _jvm(spark):
    """The kernels' builders evaluate F.col() at construction time, which
    needs an active SparkContext; the kernels themselves then run on
    plain pandas batches with no jobs launched."""
    return spark

WORDS = ["alpha", "beta", "Gamma", "DELTA", "e", "zz", "théta", "a1",
         "x y", "7", "alpha"]  # includes non-ASCII + NBSP-joined

texts = hst.lists(
    hst.one_of(
        hst.none(),
        hst.just(""),
        hst.just("   "),
        hst.lists(hst.sampled_from(WORDS), min_size=0, max_size=40)
        .map(" ".join),
        hst.text(max_size=60),
    ),
    min_size=1, max_size=12,
)


def _run_kernel(make_df, texts_list):
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(texts_list), dtype=np.int64),
        "text": texts_list,
    })
    out = list(make_df([pdf]))
    return pd.concat(out) if out else pd.DataFrame(
        columns=["doc_id", "n_sh", "sh"])


def _simhash_ref(text: str, bits: int = 64) -> int:
    """The pre-vectorization per-doc model (dedup.py history)."""
    nonword = re.compile(r"[^a-z0-9]+")
    words = [w for w in nonword.sub(" ", (text or "").lower()).split() if w]
    if not words:
        return 0
    uniq, counts = np.unique(np.array(words), return_counts=True)
    hv = np.array([h64_py(w) for w in uniq.tolist()], dtype=np.uint64)
    bitmat = (hv[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]
              ) & np.uint64(1)
    signed = np.where(bitmat == 1, 1, -1) * counts[:, None]
    sums = signed.sum(axis=0)
    fp = np.uint64(0)
    for bpos in np.nonzero(sums > 0)[0]:
        fp |= np.uint64(1) << np.uint64(bpos)
    return int(fp.astype(np.int64))


def _shingles_ref(text: str, n_words: int = 3):
    """Per-doc model of shingles_hashed(word_hash='md5')."""
    strip = re.compile(r"[^a-z0-9\s]", re.ASCII)
    ws = re.compile(r"\s+", re.ASCII)
    t = ws.sub(" ", strip.sub("", (text or "").lower())).strip()
    words = [w for w in t.split(" ") if w]
    if len(words) < n_words:
        return None
    wh = np.fromiter((h64_py(w) for w in words), dtype=np.int64,
                     count=len(words))
    m = len(wh) - n_words + 1
    g = np.zeros(m, dtype=np.int64)
    for k in range(n_words):
        g ^= wh[k: m + k] << np.int64(n_words - 1 - k)
    uniq = np.unique(g)
    return len(uniq), set(uniq.tolist())


class FakeDF:
    """Captures the Arrow kernel the operator would hand to mapInPandas
    so hypothesis can drive it on plain pandas batches (no Spark jobs)."""

    def __init__(self, holder):
        self._h = holder

    def select(self, *a, **k):
        return self

    def mapInPandas(self, kern, schema=None):
        self._h["kern"] = kern
        return self


@settings(max_examples=150, deadline=None)
@given(texts)
def test_simhash_vectorized_matches_per_doc_model(ts):
    from ts2g2_spark.operators import dedup

    holder = {}
    dedup.simhash_fingerprints(FakeDF(holder))
    out = _run_kernel(lambda b: holder["kern"](b), ts)
    got = dict(zip(out["doc_id"].tolist(), out["simhash"].tolist()))
    assert len(got) == len(ts)
    for i, t in enumerate(ts):
        assert got[i] == _simhash_ref(t), (i, t)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_md5_shingle_vectorized_matches_per_doc_model(ts):
    from ts2g2_spark.operators import dedup

    holder = {}
    dedup.shingles_hashed_md5_kernel(FakeDF(holder), n_words=3)

    out = _run_kernel(lambda b: holder["kern"](b), ts)
    by_doc = {}
    for doc_id, grp in out.groupby("doc_id"):
        n_sh = set(grp["n_sh"].tolist())
        assert len(n_sh) == 1
        by_doc[doc_id] = (n_sh.pop(), set(grp["sh"].tolist()))
    for i, t in enumerate(ts):
        want = _shingles_ref(t, 3)
        if want is None:
            assert i not in by_doc, (i, t)
        else:
            assert by_doc.get(i) == want, (i, t)
