"""Deterministic generator for the engine's input table
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
— BASELINE.json input_hint / FIXTURES.md §1.

Fully distributed: spark.range(N) -> mapInPandas, one independent PCG64
stream per doc (SeedSequence([seed, doc_index])), so any subset of docs can
be regenerated identically on any partitioning — the generator itself is
resume-safe and cluster-size-invariant.  Sources follow a Zipf(s) law over
20 buckets, deliberately hot-keyed to exercise salting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
VOCAB = 50257
N_SOURCES = 20
ZIPF_S = 1.2


def _zipf_probs(n: int = N_SOURCES, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _gen_batch(ids: np.ndarray, seed: int, gap_p: float) -> pd.DataFrame:
    probs = _zipf_probs()
    rows = []
    for i in ids:
        rng = np.random.default_rng(np.random.SeedSequence([seed, int(i)]))
        ln = rng.lognormal(mean=np.log(256), sigma=0.8)
        n = int(np.clip(ln, 8, 4096))
        toks = rng.integers(0, VOCAB, size=n, dtype=np.int32)
        src = f"src_{rng.choice(N_SOURCES, p=probs):02d}"
        if gap_p > 0.0:
            keep = rng.random(n) >= gap_p
            # outage-style gaps: drop a random INTERIOR minute bucket (not
            # the first/last, so the gap sits inside the per-series span and
            # gap-fill has something to fill — per-position drops alone
            # never empty a 60-point bucket)
            n_buckets = n // 60
            if n_buckets >= 3 and rng.random() < 0.8:
                gone = int(rng.integers(1, n_buckets - 1))
                keep[gone * 60: (gone + 1) * 60] = False
            if not keep.any():
                keep[0] = True
            positions = np.nonzero(keep)[0].astype(np.int32)
            toks = toks[keep]
        else:
            positions = None
        rows.append(
            {
                "doc_id": f"doc_{int(i):012d}",
                "tokens": toks,
                "n_tok": len(toks),
                "source": src,
                **({"positions": positions} if gap_p > 0.0 else {}),
            }
        )
    return pd.DataFrame(rows)


def tokenized_sequences(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    gap_p: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the input table. gap_p > 0 drops each position with prob gap_p
    (seeded) and adds a positions:array<int> column for gap-fill tests."""
    schema = SCHEMA + (", positions array<int>" if gap_p > 0.0 else "")
    parts = num_partitions or max(
        spark.sparkContext.defaultParallelism, n_docs // 5000 or 1
    )
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed, gap_p)

    return base.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Scale-proof corpora: synthetic documents / embeddings with PLANTED
# near-duplicate families, for exercising the dedup chain and the ANN/LSH
# branches at sizes the sf parquet fixtures never reach.  Same determinism
# contract as tokenized_sequences: one PCG64 stream per id, so any subset
# regenerates identically under any partitioning.
# ---------------------------------------------------------------------------

_DOC_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "the a line sort window order data column join small customer query "
    "big group stream code plan disk cache node shard page scale read "
    "write tier rollup gap fill token count bucket serve state fold"
).split()

#: family layout: ids are grouped in blocks of _FAMILY_GROUP; the first
#: k = round(dup_frac * group) members of each block are near-copies of
#: the block's base content (member 0 IS the base; members 1..k-1 carry
#: two seeded word edits / 1e-3 noise), the rest are independent.
_FAMILY_GROUP = 20


def documents_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 7,
    dup_frac: float = 0.15,
    words_per_doc: int = 48,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic word-salad corpus (doc_id:long, text, source) with
    planted near-duplicate families (two-word edits within a family —
    high n-gram Jaccard, non-identical), sized for dedup-chain scale
    runs."""
    k_dups = int(round(dup_frac * _FAMILY_GROUP))
    parts = num_partitions or max(
        spark.sparkContext.defaultParallelism, n_docs // 20000 or 1)
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = np.array(_DOC_WORDS)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for i in pdf["id"].tolist():
                g, m = divmod(int(i), _FAMILY_GROUP)
                if m < k_dups:
                    rng = np.random.default_rng(
                        np.random.SeedSequence([seed, g, 777]))
                    words = rng.choice(vocab, size=words_per_doc)
                    if m > 0:
                        r2 = np.random.default_rng(
                            np.random.SeedSequence([seed, g, m]))
                        # distinct positions + replacements that differ
                        # from the original word, so every family member
                        # really is a NEAR-dup (a degenerate zero-edit
                        # member would be an exact dup and collide in
                        # every minhash band, skewing the banding-curve
                        # numbers the scale run reports)
                        idx = r2.choice(words_per_doc, size=2,
                                        replace=False)
                        for j in idx:
                            w = words[j]
                            while True:
                                nw = vocab[r2.integers(0, len(vocab))]
                                if nw != w:
                                    break
                            words[j] = nw
                else:
                    rng = np.random.default_rng(
                        np.random.SeedSequence([seed, int(i)]))
                    words = rng.choice(vocab, size=words_per_doc)
                rows.append({
                    "doc_id": int(i),
                    "text": " ".join(words.tolist()),
                    "source": f"src_{int(i) % 16:02d}",
                })
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, schema="doc_id long, text string, source string")


def embeddings_corpus(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    seed: int = 11,
    dup_frac: float = 0.15,
    noise: float = 1e-3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic embedding corpus (vec_id:long, embedding:array<double>)
    with planted near-duplicate families (cosine ~ 1 - O(noise^2) within
    a family), for ANN/semantic-dedup scale runs."""
    k_dups = int(round(dup_frac * _FAMILY_GROUP))
    parts = num_partitions or max(
        spark.sparkContext.defaultParallelism, n_vecs // 50000 or 1)
    base = spark.range(0, n_vecs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            vecs = np.empty((len(ids), dim))
            for t, i in enumerate(ids.tolist()):
                g, m = divmod(int(i), _FAMILY_GROUP)
                if m < k_dups:
                    rng = np.random.default_rng(
                        np.random.SeedSequence([seed, g, 777]))
                    v = rng.normal(size=dim)
                    if m > 0:
                        r2 = np.random.default_rng(
                            np.random.SeedSequence([seed, g, m]))
                        v = v + r2.normal(scale=noise, size=dim)
                else:
                    rng = np.random.default_rng(
                        np.random.SeedSequence([seed, int(i)]))
                    v = rng.normal(size=dim)
                vecs[t] = v
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(vecs)})

    return base.mapInPandas(
        gen, schema="vec_id long, embedding array<double>")
