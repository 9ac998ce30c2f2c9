"""Summarization operators (M4 / rolling z-score / SAX) vs brute-force
pandas/numpy oracles, including tie and degenerate-series cases."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from ts2g2_spark.operators.summarize import (
    SAX_BREAKPOINTS, m4_downsample, rolling_zscore, sax_symbols,
)

TS = dt.datetime
BASE = TS(2024, 1, 1)


def _events(seed=5, n=600, n_keys=7, tie_every=11):
    rng = np.random.default_rng(seed)
    secs = rng.integers(0, 40_000, n)
    vals = rng.normal(size=n).round(2)  # .round(2) manufactures ties
    df = pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "ts": [BASE + dt.timedelta(seconds=int(s)) for s in secs],
        "value": vals,
        "event_id": np.arange(n, dtype=np.int64),
    })
    # exact duplicate timestamps inside a series: order_col must break them
    dup = df.iloc[::tie_every].copy()
    dup["event_id"] = np.arange(n, n + len(dup), dtype=np.int64)
    dup["value"] = dup["value"] + 0.5
    return pd.concat([df, dup], ignore_index=True)


def _m4_oracle(pdf, tier_s):
    out = []
    pdf = pdf.copy()
    pdf["bucket"] = pdf["ts"].map(
        lambda t: BASE + dt.timedelta(
            seconds=(int((t - BASE).total_seconds()) // tier_s) * tier_s))
    for (u, b), g in pdf.groupby(["user_id", "bucket"]):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        mn = g.loc[g["value"].idxmin()]  # idxmin: first occurrence wins
        mx = g.loc[g["value"].idxmax()]
        out.append((u, b, len(g),
                    g["value"].iloc[0], g["ts"].iloc[0],
                    g["value"].iloc[-1], g["ts"].iloc[-1],
                    g["value"].min(), mn["ts"],
                    g["value"].max(), mx["ts"]))
    return set(out)


def test_m4_matches_bruteforce(spark):
    pdf = _events()
    got = {tuple(r) for r in m4_downsample(
        spark.createDataFrame(pdf), tier_s=3600,
        order_col="event_id").collect()}
    assert got == _m4_oracle(pdf, 3600)


def test_m4_min_max_tie_earliest(spark):
    rows = [(1, BASE + dt.timedelta(seconds=s), v, i)
            for i, (s, v) in enumerate(
                [(10, 5.0), (20, 1.0), (30, 1.0), (40, 5.0)])]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    r = m4_downsample(spark.createDataFrame(pdf), tier_s=3600,
                      order_col="event_id").collect()[0]
    assert r.min_ts == rows[1][1] and r.max_ts == rows[0][1]
    assert (r.first_val, r.last_val) == (5.0, 5.0)


def _z_oracle(pdf, window, min_points, threshold):
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for i in range(len(g)):
            prior = g["value"].iloc[max(0, i - window): i]
            z = None
            if len(prior) >= min_points and prior.std(ddof=1) > 0:
                z = round((g["value"].iloc[i] - prior.mean())
                          / prior.std(ddof=1), 6)
            out[(u, g["event_id"].iloc[i])] = (
                len(prior), z, z is not None and abs(z) > threshold)
    return out


def test_rolling_zscore_matches_bruteforce(spark):
    pdf = _events(seed=9)
    got = {(r.user_id, r.event_id): (r.n_prior, r.z, r.is_anomaly)
           for r in rolling_zscore(
               spark.createDataFrame(pdf), order_col="event_id",
               window=15, min_points=8, threshold=2.0).collect()}
    want = _z_oracle(pdf, 15, 8, 2.0)
    assert set(got) == set(want)
    for k in want:
        gn, gz, ga = got[k]
        wn, wz, wa = want[k]
        assert gn == wn and ga == wa, k
        if wz is None:
            assert gz is None, k
        else:
            assert gz == pytest.approx(wz, abs=2e-6), k


def test_rolling_zscore_short_series_all_null(spark):
    pdf = pd.DataFrame({
        "user_id": [1] * 5,
        "ts": [BASE + dt.timedelta(seconds=i) for i in range(5)],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        "event_id": range(5),
    })
    rows = rolling_zscore(spark.createDataFrame(pdf), order_col="event_id",
                          window=20, min_points=10).collect()
    assert all(r.z is None and not r.is_anomaly for r in rows)


def _sax_oracle(pdf, seg_len, alphabet):
    bps = SAX_BREAKPOINTS[alphabet]
    out = set()
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        sd = g["value"].std(ddof=1)
        z = ((g["value"] - g["value"].mean()) / sd if sd and sd > 0
             else pd.Series(0.0, index=g.index))
        for seg in range((len(g) + seg_len - 1) // seg_len):
            frame = z.iloc[seg * seg_len: (seg + 1) * seg_len]
            paa = frame.mean()
            sym = chr(ord("a") + sum(paa >= b for b in bps))
            out.add((u, seg, len(frame), round(paa, 6), sym))
    return out


@pytest.mark.parametrize("alphabet", [3, 4, 6])
def test_sax_matches_bruteforce(spark, alphabet):
    pdf = _events(seed=13)
    got = {tuple(r) for r in sax_symbols(
        spark.createDataFrame(pdf), order_col="event_id",
        seg_len=8, alphabet=alphabet).collect()}
    want = _sax_oracle(pdf, 8, alphabet)
    # float-compare paa with tolerance: match on keys, then values
    gk = {t[:3]: t[3:] for t in got}
    wk = {t[:3]: t[3:] for t in want}
    assert set(gk) == set(wk)
    for k in wk:
        assert gk[k][0] == pytest.approx(wk[k][0], abs=2e-6), k
        assert gk[k][1] == wk[k][1], k


def test_sax_constant_series_middle_symbol(spark):
    pdf = pd.DataFrame({
        "user_id": [1] * 10,
        "ts": [BASE + dt.timedelta(seconds=i) for i in range(10)],
        "value": [3.0] * 10,
        "event_id": range(10),
    })
    rows = sax_symbols(spark.createDataFrame(pdf), order_col="event_id",
                       seg_len=4, alphabet=4).collect()
    # 10 pts / seg_len 4 -> segments of 4, 4, 2 (trailing partial kept)
    assert sorted((r.seg, r.n_pts) for r in rows) == [(0, 4), (1, 4), (2, 2)]
    assert all(r.paa == 0.0 and r.symbol == "c" for r in rows)


def test_sax_bad_alphabet_raises(spark):
    pdf = pd.DataFrame({"user_id": [1], "ts": [BASE], "value": [1.0],
                        "event_id": [0]})
    with pytest.raises(ValueError, match="alphabet"):
        sax_symbols(spark.createDataFrame(pdf), alphabet=9)


def _lttb_oracle(pdf, n_out):
    """The operator's documented parallel-LTTB contract."""
    out = []
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(g)
        x = np.arange(n, dtype=float)
        y = g["value"].to_numpy(dtype=float)
        if n <= n_out:
            for p in range(n):
                out.append((u, p, p, g["ts"].iloc[p], y[p], None))
            continue
        bucket = np.empty(n, dtype=int)
        bucket[0], bucket[-1] = 0, n_out - 1
        for p in range(1, n - 1):
            bucket[p] = 1 + int(np.floor((p - 1) * (n_out - 2) / (n - 2)))
        mx = {b: x[bucket == b].mean() for b in range(n_out)}
        my = {b: y[bucket == b].mean() for b in range(n_out)}
        for b in range(n_out):
            idx = np.where(bucket == b)[0]
            if b == 0 or b == n_out - 1:
                out.append((u, b, int(idx[0]), g["ts"].iloc[idx[0]],
                            y[idx[0]], None))
                continue
            ax, ay = mx[b - 1], my[b - 1]
            cx, cy = mx[b + 1], my[b + 1]
            areas = np.round(
                np.abs((ax - cx) * (y[idx] - ay)
                       - (ax - x[idx]) * (cy - ay)) / 2 + 1e-10, 9)
            best = idx[np.argmax(areas)]  # argmax: first max wins = min pos
            out.append((u, b, int(best), g["ts"].iloc[best], y[best],
                        float(areas[np.argmax(areas)])))
    return out


def test_lttb_matches_bruteforce(spark):
    from ts2g2_spark.operators.summarize import lttb_downsample

    pdf = _events(seed=13)
    n_out = 12
    got = {(r.user_id, r.bucket): r for r in lttb_downsample(
        spark.createDataFrame(pdf), n_out=n_out,
        order_col="event_id").collect()}
    exp = _lttb_oracle(pdf, n_out)
    assert len(got) == len(exp)
    for (u, b, pos, ts, val, area) in exp:
        r = got[(u, b)]
        assert (r.pos, r.ts) == (pos, ts), (u, b)
        assert r.value == pytest.approx(val, abs=1e-12)
        if area is None:
            assert r.area is None, (u, b)
        else:
            assert r.area == pytest.approx(area, abs=1e-8), (u, b)


def test_lttb_keeps_whole_short_series_and_endpoints(spark):
    from ts2g2_spark.operators.summarize import lttb_downsample

    n = 50
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts": [BASE + dt.timedelta(seconds=i) for i in range(n)],
        "value": np.sin(np.arange(n) / 3).round(3),
        "event_id": np.arange(n, dtype=np.int64),
    })
    rows = lttb_downsample(spark.createDataFrame(pdf), n_out=10,
                           order_col="event_id").collect()
    assert len(rows) == 10  # every bucket non-empty when n > n_out
    poss = sorted(r.pos for r in rows)
    assert poss[0] == 0 and poss[-1] == n - 1  # endpoints always kept
    short = pdf.head(8)
    rows = lttb_downsample(spark.createDataFrame(short), n_out=10,
                           order_col="event_id").collect()
    assert len(rows) == 8 and all(r.area is None for r in rows)


def test_lttb_preserves_planted_spike(spark):
    from ts2g2_spark.operators.summarize import lttb_downsample

    n = 200
    vals = np.zeros(n)
    vals[137] = 50.0  # a spike the downsample must keep
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts": [BASE + dt.timedelta(seconds=i) for i in range(n)],
        "value": vals,
        "event_id": np.arange(n, dtype=np.int64),
    })
    rows = lttb_downsample(spark.createDataFrame(pdf), n_out=20,
                           order_col="event_id").collect()
    assert any(r.pos == 137 for r in rows)
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(None, n_out=2)


def test_sax_motifs_match_bruteforce(spark):
    from ts2g2_spark.operators.summarize import sax_motifs, sax_symbols

    pdf = _events(seed=61)
    sdf = spark.createDataFrame(pdf)
    # oracle: slide a word over the (already-tested) sax_symbols output
    syms = {}
    for r in sax_symbols(sdf, order_col="event_id",
                         seg_len=4).collect():
        syms.setdefault(r.user_id, {})[r.seg] = r.symbol
    w = 3
    exp = {}
    for u, d in syms.items():
        s = "".join(d[i] for i in range(len(d)))
        for i in range(len(s) - w + 1):
            key = (u, s[i:i + w])
            cnt, first = exp.get(key, (0, i))
            exp[key] = (cnt + 1, min(first, i))
    got = {(r.user_id, r.word): (r.n_occurrences, r.first_seg)
           for r in sax_motifs(sdf, word_len=w, order_col="event_id",
                               seg_len=4).collect()}
    assert got == exp


def test_sax_motifs_finds_repeated_pattern(spark):
    from ts2g2_spark.operators.summarize import sax_motifs

    # a clean period-16 sine: with seg_len=4 every period emits the same
    # 4-segment word, so the top motif must recur ~n/16 times
    n = 128
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts": [BASE + dt.timedelta(seconds=i) for i in range(n)],
        "value": np.sin(2 * np.pi * np.arange(n) / 16).round(6),
        "event_id": np.arange(n, dtype=np.int64),
    })
    rows = sax_motifs(spark.createDataFrame(pdf), word_len=4,
                      order_col="event_id", seg_len=4).collect()
    best = max(rows, key=lambda r: r.n_occurrences)
    assert best.n_occurrences >= 7
    with pytest.raises(ValueError, match="word_len"):
        sax_motifs(None, word_len=1)
