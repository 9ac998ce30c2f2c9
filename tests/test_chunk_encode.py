"""Sliding-window chunking and vocabulary dictionary-encoding vs
brute-force Python oracles."""

from __future__ import annotations

import numpy as np
import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        "doc_id string, text string")


def _chunk_oracle(words, chunk, stride, min_tokens):
    out = []
    c = 0
    while c * stride < len(words):
        s = c * stride
        w = words[s:s + chunk]
        if c == 0 or (len(w) >= min_tokens and len(w) > chunk - stride):
            out.append((c, s, len(w), " ".join(w)))
        c += 1
    return out


@pytest.mark.parametrize("chunk,stride,mt", [(8, 6, 2), (5, 5, 1),
                                             (16, 4, 4)])
def test_chunk_documents_matches_oracle(spark, chunk, stride, mt):
    from ts2g2_spark.operators.text import chunk_documents

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(int(rng.integers(1, 40))))
             for _ in range(30)] + ["", "   ", "single"]
    rows = chunk_documents(_docs(spark, texts), chunk_size=chunk,
                           stride=stride, min_tokens=mt).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_word, r.n_tokens, r.chunk_text))
    for i, t in enumerate(texts):
        words = t.split()
        exp = _chunk_oracle(words, chunk, stride, mt) if words else []
        assert sorted(got.get(f"d{i}", [])) == exp, (i, t)


def test_chunk_documents_param_validation(spark):
    from ts2g2_spark.operators.text import chunk_documents

    d = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, chunk_size=8, stride=9)
    with pytest.raises(ValueError, match="min_tokens"):
        chunk_documents(d, chunk_size=8, stride=8, min_tokens=0)


def test_build_vocab_dense_rank_and_min_count(spark):
    from ts2g2_spark.operators.text import build_vocab

    texts = ["b a a c", "a b b", "c a z"]
    rows = build_vocab(_docs(spark, texts)).collect()
    # counts: a=4, b=3, c=2, z=1 -> ids dense by (cnt desc, word)
    assert {(r.word, r.cnt, r.id) for r in rows} == {
        ("a", 4, 0), ("b", 3, 1), ("c", 2, 2), ("z", 1, 3)}
    r2 = build_vocab(_docs(spark, texts), min_count=2).collect()
    assert {(r.word, r.id) for r in r2} == {("a", 0), ("b", 1), ("c", 2)}


def test_build_vocab_ties_and_scale_of_rank(spark):
    from ts2g2_spark.operators.text import build_vocab

    # many words with identical counts: dense ids must still be a
    # permutation of 0..V-1 ordered by (cnt desc, word)
    texts = [" ".join(f"t{i:03d}" for i in range(100))] * 2
    rows = sorted(build_vocab(_docs(spark, texts)).collect(),
                  key=lambda r: r.id)
    assert [r.id for r in rows] == list(range(100))
    assert [r.word for r in rows] == sorted(f"t{i:03d}" for i in range(100))


def test_dict_encode_roundtrip_and_oov(spark):
    from ts2g2_spark.operators.text import build_vocab, dict_encode

    texts = ["b a a c", "a b b", "c a z", "", "  "]
    df = _docs(spark, texts)
    rows = {r.doc_id: r for r in dict_encode(df, min_count=2).collect()}
    # vocab(min_count=2): a=0, b=1, c=2; z is OOV -> -1
    assert list(rows["d0"].ids) == [1, 0, 0, 2]
    assert list(rows["d1"].ids) == [0, 1, 1]
    assert list(rows["d2"].ids) == [2, 0, -1]
    assert "d3" not in rows and "d4" not in rows
    assert rows["d0"].n_tokens == 4
    # supplied external vocab is honored verbatim
    v = build_vocab(_docs(spark, ["z z"]))
    got = {r.doc_id: list(r.ids)
           for r in dict_encode(df, vocab=v).collect()}
    assert got["d2"] == [-1, -1, 0]
