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


# ------------------------------------------------------- hot-shingle cap
def test_cap_shingles_kills_boilerplate_fanout(spark):
    """1000 docs sharing one boilerplate shingle: uncapped, the self-join
    fans out to ~500k pairs; capped, only genuinely-similar pairs join."""
    from pyspark.sql import functions as F

    boiler = "all rights reserved contact us"
    rows = [(i, f"{boiler} unique content piece number {i} "
                f"with extra words {i * 7} and {i * 13}")
            for i in range(1000)]
    # two true near-dups sharing rare shingles
    rows.append((2000, "the quick brown fox jumps over the lazy dog today"))
    rows.append((2001, "the quick brown fox jumps over the lazy dog now"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup.shingles_hashed(docs, n_words=3).cache()
    capped = dedup.cap_shingles(sh, max_doc_freq=10).cache()

    def n_join_pairs(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .count())

    assert n_join_pairs(sh) > 400_000  # quadratic boilerplate fan-out
    assert n_join_pairs(capped) < 5_000  # fan-out gone

    pairs = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(
        docs, n_words=3, threshold=0.4, shingle_frame=capped).collect()}
    assert (2000, 2001) in pairs  # real near-dup survives the cap


def test_cap_shingles_noop_below_cap(spark):
    """With a cap above every observed DF, capped output == exact."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    exact = {(r.doc_a, r.doc_b, round(r.jaccard, 6)) for r in
             dedup.ngram_jaccard_pairs(docs, n_words=3,
                                       threshold=0.5).collect()}
    capped = {(r.doc_a, r.doc_b, round(r.jaccard, 6)) for r in
              dedup.ngram_jaccard_pairs(docs, n_words=3, threshold=0.5,
                                        max_doc_freq=10**9).collect()}
    assert exact == capped


def test_md5_kernel_shingles_equal_catalyst(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cat = {(r.doc_id, r.n_sh, r.sh) for r in dedup.shingles_hashed(
        docs, n_words=3, word_hash="md5").collect()}
    ker = {(r.doc_id, r.n_sh, r.sh) for r in
           dedup.shingles_hashed_md5_kernel(docs, n_words=3).collect()}
    assert cat == ker and cat


# ------------------------------------------------- connected components
# local_threshold=0 forces the distributed pointer-jumping path; the
# default exercises the driver union-find fast path — both must agree.
@pytest.mark.parametrize("thr", [1_000_000, 0])
def test_connected_components_chain_and_clique(spark, thr):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain -> component 1
         (10, 11), (10, 12), (11, 12),  # clique -> component 10
         (20, 21)],                     # pair -> component 20
        "doc_a long, doc_b long")
    got = {(r.doc_id, r.component) for r in
           dedup.connected_components(pairs, local_threshold=thr).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20)}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components(pairs).collect() == []


def test_connected_components_long_chain(spark):
    """Diameter 40 chain — exercises multi-round convergence of the
    DISTRIBUTED path (local_threshold=0)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long")
    got = {(r.doc_id, r.component) for r in
           dedup.connected_components(
               pairs, max_iter=12, local_threshold=0).collect()}
    assert got == {(i, 0) for i in range(41)}


def test_connected_components_random_vs_networkx(spark):
    """Property: component partitions match networkx on random graphs."""
    import networkx as nx
    import numpy as np

    rng = np.random.default_rng(17)
    for trial in range(4):
        n = int(rng.integers(10, 60))
        m = int(rng.integers(5, 80))
        edges = {(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2))
                 if a != b}
        g = nx.Graph()
        g.add_edges_from(edges)
        want = {}
        for comp in nx.connected_components(g):
            c = min(comp)
            for node in comp:
                want[node] = c
        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "doc_a long, doc_b long")
        got = {r.doc_id: r.component for r in
               dedup.connected_components(pairs).collect()}
        assert got == want, (trial, n, m)
        got_dist = {r.doc_id: r.component for r in
                    dedup.connected_components(
                        pairs, local_threshold=0).collect()}
        assert got_dist == want, ("distributed", trial, n, m)


def test_md5_kernel_nbsp_parity(spark):
    """Non-ASCII whitespace (NBSP): the Python kernel must tokenize like
    the ASCII-\\s Catalyst/oracle twins (which DELETE the NBSP, fusing
    the words), not like Unicode-\\s Python (which would split them)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    cat = {(r.doc_id, r.n_sh, r.sh) for r in dedup.shingles_hashed(
        docs, n_words=3, word_hash="md5").collect()}
    ker = {(r.doc_id, r.n_sh, r.sh) for r in
           dedup.shingles_hashed_md5_kernel(docs, n_words=3).collect()}
    assert cat == ker and cat


def test_lsh_candidate_pairs_width_mismatch_raises(spark):
    import pytest as _pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = dedup.minhash_signatures(docs.limit(20), n_words=3, n_hashes=32)
    # ANSI sessions raise INVALID_ARRAY_INDEX from element_at
    # before the assert_true; non-ANSI sessions hit the
    # assert_true message — both fail loudly
    with _pytest.raises(
            Exception,
            match="n_hashes|ARRAY_INDEX|ArrayIndex"):
        dedup.lsh_candidate_pairs(sigs, bands=8, n_hashes=64).collect()


# --------------------------------------------------------------- spans

def _ref_spans(texts, n_words, min_count):
    """Pure-Python reference for duplicated_spans: count every word
    n-gram occurrence across the corpus, mark positions whose gram count
    >= min_count, merge positions within n_words into maximal islands."""
    import re

    strip = re.compile(r"[^a-z0-9\s]", re.ASCII)
    toks = {d: strip.sub("", t.lower()).split() for d, t in texts}
    from collections import Counter

    cnt = Counter()
    occ = {}
    for d, ws in toks.items():
        occ[d] = [tuple(ws[i: i + n_words])
                  for i in range(len(ws) - n_words + 1)]
        cnt.update(occ[d])
    out = []
    for d, grams in occ.items():
        marked = [i for i, g in enumerate(grams) if cnt[g] >= min_count]
        if not marked:
            continue
        start = prev = marked[0]
        n_sh = 1
        for i in marked[1:]:
            if i - prev > n_words:
                out.append((d, start, prev + n_words - 1,
                            prev + n_words - start, n_sh))
                start, n_sh = i, 0
            prev = i
            n_sh += 1
        out.append((d, start, prev + n_words - 1,
                    prev + n_words - start, n_sh))
    return set(out)


def test_duplicated_spans_within_doc(spark):
    """A 12-word phrase repeated inside one doc -> two 12-word spans."""
    rng = np.random.default_rng(7)
    filler1 = _doc(rng, 30)
    filler2 = _doc(rng, 25)
    phrase = "omega" + " ".join(f" uniq{i}" for i in range(11))
    text = f"{filler1} {phrase} {filler2} {phrase} endword"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {tuple(r) for r in dedup.duplicated_spans(
        docs, n_words=10, min_count=2).collect()}
    want = _ref_spans([(1, text)], 10, 2)
    assert got == want
    # the planted phrase itself must be covered by some span in each copy
    starts = sorted(r[1] for r in got)
    assert len(got) >= 2 and len(starts) == len(set(starts))


def test_duplicated_spans_cross_doc_and_merge(spark):
    rng = np.random.default_rng(11)
    shared = " ".join(f"dup{i}" for i in range(15))
    rows = [
        (1, f"{_doc(rng, 20)} {shared} {_doc(rng, 20)}"),
        (2, f"{shared} {_doc(rng, 18)}"),
        (3, _doc(rng, 40)),  # WORDS-sampled: repeats shared w/ others
    ]
    n = 10
    got = {tuple(r) for r in dedup.duplicated_spans(
        docs=spark.createDataFrame(rows, "doc_id long, text string"),
        n_words=n, min_count=2).collect()}
    assert got == _ref_spans(rows, n, 2)
    assert any(r[0] == 1 for r in got) and any(r[0] == 2 for r in got)
    # doc 2's span starts at word 0 and covers the shared phrase
    d2 = min(r for r in got if r[0] == 2)
    assert d2[1] == 0 and d2[2] >= 14


def test_duplicated_spans_no_dups(spark):
    """All-distinct vocabulary -> no duplicated grams -> empty output."""
    rows = [(1, " ".join(f"a{i}" for i in range(40))),
            (2, " ".join(f"b{i}" for i in range(40)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.duplicated_spans(docs, n_words=10).count() == 0


def test_duplicated_spans_md5_matches_xxhash(spark):
    """Hash family must not change span structure (collision-free here)."""
    rng = np.random.default_rng(13)
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [(1, f"{_doc(rng, 15)} {shared}"), (2, f"{shared} {_doc(rng, 15)}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in dedup.duplicated_spans(
        docs, n_words=10, word_hash="xxhash64").collect()}
    b = {tuple(r) for r in dedup.duplicated_spans(
        docs, n_words=10, word_hash="md5").collect()}
    assert a == b and a


def test_line_dedup_strips_cross_doc_boilerplate(spark):
    """Lines in more than max_df distinct docs are stripped everywhere
    (case-insensitively), all occurrences, while in-document repetition
    alone never marks a line hot; blanks are kept as structure; docs
    losing every line stay as rows with empty text."""
    import pandas as pd

    from ts2g2_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "COOKIE BANNER\nreal one\nfooter",   # banner df=4, footer df=3
            "cookie banner\nreal two\nfooter",
            "Cookie Banner \nunique\nfooter",
            "self\nself\nself\nself",      # in-doc repeats: never hot
            "cookie banner",               # all boilerplate -> empty
        ],
    }))
    # max_df=3: only the 4-doc banner is hot; the 3-doc footer survives
    got = {r["doc_id"]: r for r in line_dedup(docs, max_df=3).collect()}
    assert len(got) == 5  # every doc kept as a row
    assert got[1]["text"] == "real one\nfooter"
    assert got[2]["text"] == "real two\nfooter"
    assert got[3]["text"] == "unique\nfooter"
    assert got[4]["text"] == "self\nself\nself\nself"
    assert got[5]["text"] == ""
    assert (got[5]["n_lines"], got[5]["n_removed"]) == (1, 1)
    # max_df=2 also strips the 3-doc footer
    got2 = {r["doc_id"]: r for r in line_dedup(docs, max_df=2).collect()}
    assert got2[1]["text"] == "real one"
    assert got2[4]["text"] == "self\nself\nself\nself"
    assert got2[1]["n_removed"] == 2


def test_line_dedup_blanks_and_shuffled_hot_join(spark):
    """Whitespace-only lines are never counted or stripped even when
    universal; broadcast_hot=False (the pathological-hot-set fallback)
    gives identical results; empty docs survive as one blank line."""
    import pandas as pd
    import pytest as _pt

    from ts2g2_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a\n \nkeep me", "b\n \nkeep me", ""],
    }))
    for bc in (True, False):
        got = {r["doc_id"]: r
               for r in line_dedup(docs, max_df=1,
                                   broadcast_hot=bc).collect()}
        assert got[1]["text"] == "a\n "
        assert got[2]["text"] == "b\n "
        assert got[3]["text"] == ""
        assert (got[3]["n_lines"], got[3]["n_removed"]) == (1, 0)
    with _pt.raises(ValueError, match="max_df"):
        line_dedup(docs, max_df=0)


def test_line_dedup_null_text_doc_survives(spark):
    """split(NULL) is NULL and posexplode(NULL) yields zero rows — a
    NULL-text doc must still come back as a row (coalesced to empty),
    per the one-row-per-document contract."""
    import pandas as pd

    from ts2g2_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hot\nkeep", None]}))
    got = {r["doc_id"]: r for r in line_dedup(docs, max_df=1).collect()}
    assert set(got) == {1, 2}
    assert got[2]["text"] == ""
    assert (got[2]["n_lines"], got[2]["n_removed"]) == (1, 0)


def test_select_survivors_keeps_best_quality(spark):
    """Per component: exactly one keep=true, it has the max (rounded)
    quality, ties break to the lowest id; n_members counts the group."""
    import pandas as pd
    from ts2g2_spark.operators.dedup import select_survivors

    comp = spark.createDataFrame(pd.DataFrame({
        "doc_id":    [1, 2, 3, 7, 8],
        "component": [1, 1, 1, 7, 7]}))
    quality = spark.createDataFrame(pd.DataFrame({
        "doc_id":  [1, 2, 3, 7, 8],
        "quality": [5.0, 9.0, 9.0, 3.0, 3.0]}))
    out = (select_survivors(comp, quality).toPandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out.keep) == [False, True, False, True, False]
    assert list(out.n_members) == [3, 3, 3, 2, 2]
    # sub-rounding quality difference does NOT flip the survivor
    q2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "quality": [1.0, 1.0 + 4e-7]}))
    c2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "component": [1, 1]}))
    o2 = select_survivors(c2, q2).toPandas().sort_values("doc_id")
    assert list(o2.keep) == [True, False]  # rounds equal -> min id wins
    # empty components frame -> empty result
    ec = spark.createDataFrame([], "doc_id long, component long")
    assert select_survivors(ec, quality).count() == 0
    # member missing from the quality frame: kept in the output with
    # NULL quality, ranked last, still counted in n_members
    c3 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3], "component": [1, 1, 1]}))
    q3 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "quality": [5.0, 9.0]}))
    o3 = (select_survivors(c3, q3).toPandas()
          .sort_values("doc_id", ignore_index=True))
    assert list(o3.keep) == [False, True, False]
    assert list(o3.n_members) == [3, 3, 3]
    assert pd.isna(o3.quality[2])


def test_line_dedup_paragraph_delimiter(spark):
    """delimiter='\\n\\n' splits on blank lines ONLY: single newlines
    stay inside paragraphs, hot paragraphs strip whole, joiner
    rebuilds the blank-line structure."""
    import pandas as pd
    from ts2g2_spark.operators.dedup import line_dedup

    boiler = "shared header line\nsecond shared line"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [boiler + "\n\nunique one\nbody", boiler + "\n\nother",
                 "standalone\ndoc"],
    }))
    out = {r["doc_id"]: r for r in line_dedup(
        docs, max_df=1, delimiter=r"\n\n", joiner="\n\n").collect()}
    # the two-line boilerplate paragraph (df=2 > 1) strips as ONE unit
    assert out[1]["text"] == "unique one\nbody"
    assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "other" and out[2]["n_removed"] == 1
    # a single-newline doc is one paragraph under '\n\n' splitting
    assert out[3]["n_lines"] == 1 and out[3]["n_removed"] == 0
    assert out[3]["text"] == "standalone\ndoc"


def test_incremental_lsh_candidates_touch_batch_only(spark, docs):
    """Incremental candidates == full candidates restricted to pairs
    touching the batch; corpus-vs-corpus pairs never re-examined; the
    batch's near-dups against the old corpus are found."""
    sh = dedup.shingles_hashed(docs, n_words=3)
    sigs = dedup.minhash_signatures(docs, n_words=3, n_hashes=64,
                                    shingle_frame=sh)
    full = {(r.doc_a, r.doc_b) for r in
            dedup.lsh_candidate_pairs(sigs, bands=8,
                                      n_hashes=64).collect()}
    # batch = docs {1, 2} (the exact/near dups of doc 0)
    new_ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    inc = {(r.doc_a, r.doc_b) for r in
           dedup.incremental_lsh_candidates(
               sigs, new_ids, bands=8, n_hashes=64).collect()}
    want = {(a, b) for a, b in full if a in (1, 2) or b in (1, 2)}
    assert inc == want
    assert (0, 1) in inc and (0, 2) in inc      # new-vs-old recovered
    assert (1, 2) in inc                        # new-vs-new recovered
    assert all(a < b for a, b in inc)
    # empty batch -> no candidates; empty sigs -> empty frame, no error
    none = spark.createDataFrame([], "doc_id long")
    assert dedup.incremental_lsh_candidates(
        sigs, none, bands=8, n_hashes=64).count() == 0
    esigs = sigs.where("doc_id < 0")
    assert dedup.incremental_lsh_candidates(
        esigs, new_ids, bands=8, n_hashes=64).count() == 0


def _boilerplate_corpus(spark, k):
    """k identical 'template' docs (ids 0..k-1) + one unrelated doc: every
    LSH band bucket of the family has exactly k members."""
    rows = [(i, "same boilerplate template page body repeated for mirrors "
                "across the crawl with identical words") for i in range(k)]
    rows.append((10_000, "a completely different unique document about "
                         "nothing shared with the template family at all"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_hot_bucket_cap_star_pairs(spark):
    """VERDICT r4 #1: a planted boilerplate family of k near-identical
    docs must NOT emit k^2/2 candidate pairs.  Buckets over
    max_bucket_size star-pair around the min-id member: k-1 pairs,
    family connectivity preserved (every member reaches the hub, so
    connected-components grouping is unchanged)."""
    k = 200
    docs = _boilerplate_corpus(spark, k)
    sigs = dedup.minhash_signatures(docs, n_words=3, n_hashes=64)
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(
        sigs, bands=8, n_hashes=64, max_bucket_size=50).collect()}
    # bounded: exactly the k-1 star pairs around doc 0, not 19900 pairs
    assert pairs == {(0, i) for i in range(1, k)}
    # the star keeps the family one component
    comp = dedup.connected_components(
        spark.createDataFrame(sorted(pairs), "doc_a long, doc_b long"))
    assert {r.component for r in comp.collect()} == {0}
    # a cap no bucket exceeds reproduces the uncapped output exactly
    uncapped = {tuple(r) for r in dedup.lsh_candidate_pairs(
        sigs, bands=8, n_hashes=64, max_bucket_size=None).collect()}
    wide = {tuple(r) for r in dedup.lsh_candidate_pairs(
        sigs, bands=8, n_hashes=64, max_bucket_size=k).collect()}
    assert wide == uncapped
    assert len(uncapped) == k * (k - 1) // 2


def test_incremental_lsh_candidates_hot_bucket_cap(spark):
    """Incremental == full restricted to batch-touching pairs, WITH the
    hot-bucket star cap active on both sides; hub-in-batch and
    leaf-in-batch cases both covered."""
    k = 60
    docs = _boilerplate_corpus(spark, k)
    sigs = dedup.minhash_signatures(docs, n_words=3, n_hashes=64)
    full = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(
        sigs, bands=8, n_hashes=64, max_bucket_size=20).collect()}
    assert full == {(0, i) for i in range(1, k)}
    # leaves in the batch: only their star edges come back
    new_ids = spark.createDataFrame([(5,), (17,)], "doc_id long")
    inc = {(r.doc_a, r.doc_b) for r in dedup.incremental_lsh_candidates(
        sigs, new_ids, bands=8, n_hashes=64,
        max_bucket_size=20).collect()}
    assert inc == {(0, 5), (0, 17)}
    # the hub in the batch: every star edge touches it
    hub = spark.createDataFrame([(0,)], "doc_id long")
    inc_hub = {(r.doc_a, r.doc_b) for r in dedup.incremental_lsh_candidates(
        sigs, hub, bands=8, n_hashes=64, max_bucket_size=20).collect()}
    assert inc_hub == full
    # auto broadcast gate: a tiny batch broadcasts, a forced-off path
    # returns the same rows through the shuffle join
    inc_shuffled = {(r.doc_a, r.doc_b)
                    for r in dedup.incremental_lsh_candidates(
                        sigs, new_ids, bands=8, n_hashes=64,
                        broadcast_new=False,
                        max_bucket_size=20).collect()}
    assert inc_shuffled == inc
