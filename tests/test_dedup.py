"""Dedup family on constructed near/exact duplicates (the sf tables carry
no exact dupes, so the oracle queries alone exercise empty outputs)."""

from __future__ import annotations

import numpy as np
import pytest

from ts2g2_spark.operators import dedup

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(31)
    rows = []
    base = _doc(rng)
    rows.append((0, base))
    rows.append((1, base))                      # exact dup of 0
    near = base.split()
    near[5] = "REPLACED"
    rows.append((2, " ".join(near)))            # near dup of 0 (1 word)
    rows.append((3, _doc(rng)))                 # unrelated
    rows.append((4, _doc(rng)))                 # unrelated
    half = base.split()[:30]
    rows.append((5, " ".join(half + _doc(rng, 30).split())))  # half overlap
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].dup_cnt == 2
    assert groups[0].keep_id == 0


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(
                 docs, n_words=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup -> jaccard 1
    assert 0.5 <= pairs[(0, 2)] < 1.0    # one-word change
    assert (0, 3) not in pairs           # unrelated below threshold
    # symmetric pair for the near dup
    assert (1, 2) in pairs


def test_minhash_lsh_recovers_near_dups(docs):
    sh = dedup.shingles_hashed(docs, n_words=3)
    sigs = dedup.minhash_signatures(docs, n_words=3, n_hashes=64,
                                    shingle_frame=sh)
    cands = {(r.doc_a, r.doc_b)
             for r in dedup.lsh_candidate_pairs(sigs, bands=8).collect()}
    assert (0, 1) in cands
    assert (0, 2) in cands
    verified = {(r.doc_a, r.doc_b)
                for r in dedup.ngram_jaccard_pairs(
                    docs, n_words=3, threshold=0.5,
                    candidates=dedup.lsh_candidate_pairs(sigs, bands=8),
                    shingle_frame=sh).collect()}
    assert (0, 1) in verified and (0, 2) in verified
    assert all(a < b for a, b in verified)


def test_minhash_signature_similarity_tracks_jaccard(docs):
    sigs = {r.doc_id: r.sig
            for r in dedup.minhash_signatures(docs, n_words=3).collect()}

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / len(sigs[a])

    assert est(0, 1) == 1.0
    assert est(0, 2) > est(0, 3)
    assert est(0, 5) > est(0, 3)


def test_simhash_near(docs):
    fps = {r.doc_id: r.simhash
           for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]
    near = {(r.doc_a, r.doc_b)
            for r in dedup.simhash_near_pairs(
                dedup.simhash_fingerprints(docs), max_hamming=12)
            .collect()}
    assert (0, 1) in near


def test_shingles_hashed_counts(docs):
    rows = dedup.shingles_hashed(docs, n_words=3).groupBy("doc_id").count()
    got = {r.doc_id: r["count"] for r in rows.collect()}
    # 60 words -> 58 trigram positions (distinct-deduped <= 58)
    assert 1 <= got[0] <= 58
    assert got[0] == got[1]
