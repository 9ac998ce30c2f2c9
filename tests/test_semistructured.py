"""Schema-on-read JSON operators vs brute-force json-module oracles."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from ts2g2_spark.operators.semistructured import (
    json_extract_typed, json_key_census, json_kv_pairs,
)

DOCS = [
    '{"k": 69, "s": "hi", "f": 1.5}',
    '{"k": -3, "s": "hi", "b": true}',
    '{"k": 69, "n": null, "e": 6.02e23}',
    '{"s": "bye"}',
    "not json",          # malformed -> dropped
    "[1, 2]",            # non-object -> dropped
    None,                # NULL -> dropped
    "{}",                # empty object -> no pairs
]


def _pairs_bruteforce():
    out = []
    for j in DOCS:
        if j is None:
            continue
        try:
            obj = json.loads(j)
        except ValueError:
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            if v is None:
                out.append((k, None))
            elif isinstance(v, bool):
                out.append((k, "true" if v else "false"))
            elif isinstance(v, str):
                out.append((k, v))
            else:
                out.append((k, repr(v)))
    return out


def test_kv_pairs_scalar_text_contract(spark):
    df = spark.createDataFrame([(j,) for j in DOCS], "j string")
    got = sorted((r.key, r.value)
                 for r in json_kv_pairs(df, "j").collect())
    want = sorted(_pairs_bruteforce(), key=lambda p: (p[0], p[1] or ""))
    got = sorted(got, key=lambda p: (p[0], p[1] or ""))
    # numbers as literal text, strings unquoted, null as SQL NULL
    assert ("k", "69") in got and ("s", "hi") in got
    assert ("n", None) in got
    assert ("e", "6.02e23") in got or ("e", "6.02E23") in got
    assert len(got) == len(want)


def test_census_matches_bruteforce(spark):
    import re

    df = spark.createDataFrame([(j,) for j in DOCS], "j string")
    got = {r.key: (r.n, r.n_null, r.n_distinct, r.n_int, r.n_num)
           for r in json_key_census(df, "j").collect()}
    pairs = _pairs_bruteforce()
    keys = {k for k, _ in pairs}
    for k in keys:
        vs = [v for kk, v in pairs if kk == k]
        nonnull = [v for v in vs if v is not None]
        n_int = sum(bool(re.fullmatch(r"-?[0-9]+", v)) for v in nonnull)
        n_num = sum(bool(re.fullmatch(
            r"-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?", v))
            for v in nonnull)
        assert got[k] == (len(vs), len(vs) - len(nonnull),
                          len(set(nonnull)), n_int, n_num), k
    assert set(got) == keys


def test_census_grouped_and_fixture(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = json_key_census(ev, "props",
                          group_cols=("event_type",)).collect()
    # synthetic props carry exactly one integer key per row
    assert {r.key for r in out} == {"k"}
    for r in out:
        assert r.n == r.n_int == r.n_num and r.n_null == 0


def test_extract_typed(spark):
    df = spark.createDataFrame([(1, j) for j in DOCS],
                               "event_id long, j string")
    out = json_extract_typed(
        df, "j",
        {"k": ("$.k", "bigint"), "f": ("$.f", "double"),
         "s": ("$.s", "string")},
        keep_cols=("event_id",))
    rows = out.collect()
    assert len(rows) == len(DOCS)  # map-only: row-for-row
    ks = [r.k for r in rows]
    assert 69 in ks and -3 in ks
    fs = [r.f for r in rows if r.f is not None]
    assert fs == [1.5]
    # untypeable / missing -> NULL (try_cast), never an error
    ss = {r.s for r in rows}
    assert "hi" in ss and "bye" in ss and None in ss

    with pytest.raises(ValueError, match="at least one field"):
        json_extract_typed(df, "j", {})


def test_empty_input(spark):
    empty = spark.createDataFrame([], "j string")
    assert json_key_census(empty, "j").count() == 0
    assert json_kv_pairs(empty, "j").count() == 0
