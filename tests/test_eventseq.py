"""Event-sequence analytics (transitions / funnel / cohorts) vs
brute-force pandas oracles, including ordering and edge pins."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from ts2g2_spark.operators.eventseq import (
    cohort_retention, event_transitions, funnel,
)

TS = dt.datetime
BASE = TS(2024, 1, 1)
TYPES = ["signup", "view", "click", "purchase", "error"]


def _events(seed=31, n=800, n_keys=25):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "ts": [BASE + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 20 * 86400, n)],
        "event_type": rng.choice(TYPES, n),
        "event_id": np.arange(n, dtype=np.int64),
    })


def test_transitions_match_bruteforce(spark):
    pdf = _events()
    got = {(r.src_type, r.dst_type): (r.n, r.p)
           for r in event_transitions(
               spark.createDataFrame(pdf), order_col="event_id").collect()}
    pairs = Counter()
    for _, g in pdf.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        pairs.update(zip(seq, seq[1:]))
    src_tot = defaultdict(int)
    for (s, _), c in pairs.items():
        src_tot[s] += c
    assert set(got) == set(pairs)
    for k, c in pairs.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(c / src_tot[k[0]], abs=2e-6)


def test_transitions_no_cross_series_pairs(spark):
    pdf = pd.DataFrame({
        "user_id": [1, 2], "ts": [BASE, BASE + dt.timedelta(seconds=1)],
        "event_type": ["view", "click"], "event_id": [0, 1],
    })
    assert event_transitions(spark.createDataFrame(pdf),
                             order_col="event_id").count() == 0


def _funnel_oracle(pdf, steps):
    reach = [0] * len(steps)
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        bound = None
        for i, s in enumerate(steps):
            hits = g[(g["event_type"] == s)
                     & ((g["ts"] >= bound) if bound is not None else True)]
            if hits.empty:
                break
            bound = hits["ts"].min()
            reach[i] += 1
    return reach


def test_funnel_matches_bruteforce(spark):
    pdf = _events(seed=5)
    steps = ["view", "click", "purchase"]
    rows = {r.step: r for r in funnel(
        spark.createDataFrame(pdf), steps=steps).collect()}
    want = _funnel_oracle(pdf, steps)
    for i, s in enumerate(steps):
        r = rows[i + 1]
        assert r.step_name == s and r.n_series == want[i]
        expect = (1.0 if i == 0 and want[0] else
                  (round(want[i] / want[i - 1], 6) if i and want[i - 1]
                   else None))
        if expect is None:
            assert r.conv is None
        else:
            assert r.conv == pytest.approx(expect, abs=2e-6)


def test_funnel_order_matters(spark):
    # purchase BEFORE view: step 2 must not count
    pdf = pd.DataFrame({
        "user_id": [1, 1],
        "ts": [BASE, BASE + dt.timedelta(seconds=5)],
        "event_type": ["purchase", "view"],
        "event_id": [0, 1],
    })
    rows = {r.step: r for r in funnel(
        spark.createDataFrame(pdf), steps=["view", "purchase"]).collect()}
    assert rows[1].n_series == 1 and rows[2].n_series == 0
    assert rows[2].conv == 0.0


def test_funnel_simultaneous_counts_inclusive(spark):
    pdf = pd.DataFrame({
        "user_id": [1, 1], "ts": [BASE, BASE],
        "event_type": ["view", "purchase"], "event_id": [0, 1],
    })
    rows = {r.step: r for r in funnel(
        spark.createDataFrame(pdf), steps=["view", "purchase"]).collect()}
    assert rows[2].n_series == 1


def test_funnel_repeated_step_needs_second_event(spark):
    # "view twice": one view must NOT satisfy both steps; two views do
    pdf = pd.DataFrame({
        "user_id": [1, 2, 2],
        "ts": [BASE, BASE, BASE + dt.timedelta(seconds=5)],
        "event_type": ["view", "view", "view"],
        "event_id": [0, 1, 2],
    })
    rows = {r.step: r for r in funnel(
        spark.createDataFrame(pdf), steps=["view", "view"]).collect()}
    assert rows[1].n_series == 2 and rows[2].n_series == 1


def test_funnel_single_step_raises(spark):
    with pytest.raises(ValueError, match="steps"):
        funnel(None, steps=["view"])


def test_cohort_retention_matches_bruteforce(spark):
    pdf = _events(seed=13)
    got = {(r.cohort_day, r.offset_days): (r.n_active, r.retention)
           for r in cohort_retention(spark.createDataFrame(pdf)).collect()}
    first_day = pdf.groupby("user_id")["ts"].min().dt.date
    active = defaultdict(set)
    for _, row in pdf.iterrows():
        cd = first_day[row["user_id"]]
        active[(cd, (row["ts"].date() - cd).days)].add(row["user_id"])
    sizes = {cd: len(us) for (cd, off), us in active.items() if off == 0}
    assert set(got) == set(active)
    for k, us in active.items():
        assert got[k][0] == len(us), k
        assert got[k][1] == pytest.approx(len(us) / sizes[k[0]], abs=2e-6)


def _sessionize_oracle(pdf, gap_s):
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sid = 0
        prev = None
        for _, r in g.iterrows():
            if prev is None or (r["ts"] - prev).total_seconds() > gap_s:
                sid += 1
            key = (u, sid)
            if key not in out:
                out[key] = [r["ts"], r["ts"], 0]
            out[key][1] = max(out[key][1], r["ts"])
            out[key][2] += 1
            prev = r["ts"]
    return out


def test_sessionize_matches_bruteforce(spark):
    from ts2g2_spark.operators.eventseq import sessionize

    pdf = _events(seed=47, n=600, n_keys=12)
    gap = 6 * 3600
    got = {(r.user_id, r.session_id): r for r in sessionize(
        spark.createDataFrame(pdf), gap_s=gap,
        order_col="event_id").collect()}
    exp = _sessionize_oracle(pdf, gap)
    assert set(got) == set(exp)
    for k, (start, end, n) in exp.items():
        r = got[k]
        assert r.start_ts == start and r.end_ts == end, k
        assert r.n_events == n, k
        assert r.duration_us == int((end - start).total_seconds() * 1e6), k


def test_sessionize_boundary_gap_stays_in_session(spark):
    # gap of EXACTLY gap_s stays in-session (strict > splits)
    from ts2g2_spark.operators.eventseq import sessionize

    pdf = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [BASE, BASE + dt.timedelta(seconds=60),
               BASE + dt.timedelta(seconds=121)],
        "event_type": ["view"] * 3,
        "event_id": [0, 1, 2],
    })
    rows = sorted(sessionize(spark.createDataFrame(pdf), gap_s=60,
                             order_col="event_id").collect(),
                  key=lambda r: r.session_id)
    assert [r.n_events for r in rows] == [2, 1]
    assert rows[0].duration_us == 60_000_000


def test_sessionize_single_event_and_bad_gap(spark):
    from ts2g2_spark.operators.eventseq import sessionize

    pdf = pd.DataFrame({"user_id": [9], "ts": [BASE],
                        "event_type": ["view"], "event_id": [0]})
    rows = sessionize(spark.createDataFrame(pdf), gap_s=60).collect()
    assert len(rows) == 1 and rows[0].session_id == 1
    assert rows[0].n_events == 1 and rows[0].duration_us == 0
    with pytest.raises(ValueError, match="gap_s"):
        sessionize(None, gap_s=0)


def _hb_oracle(pdf, gap_s):
    out = []
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy() // 1000
        t = g["ts"].tolist()
        span = int(ts[-1] - ts[0]) if len(ts) > 1 else 0
        gaps = [(t[i - 1], t[i], int(ts[i] - ts[i - 1]))
                for i in range(1, len(ts))
                if ts[i] - ts[i - 1] > gap_s * 1_000_000]
        tot = sum(g[2] for g in gaps)
        up = round(100.0 * (1 - tot / span), 6) if span > 0 else 100.0
        for gs, ge, gu in gaps:
            out.append((u, gs, ge, gu, len(gaps), up))
    return sorted(out)


def test_heartbeat_gaps_matches_bruteforce(spark):
    from ts2g2_spark.operators.eventseq import heartbeat_gaps

    pdf = _events(seed=21, n=400, n_keys=5)
    got = sorted(
        (r.user_id, pd.Timestamp(r.gap_start), pd.Timestamp(r.gap_end),
         r.gap_us, r.n_gaps, r.uptime_pct)
        for r in heartbeat_gaps(spark.createDataFrame(pdf), gap_s=600,
                                order_col="event_id").collect())
    exp = [(u, pd.Timestamp(a), pd.Timestamp(b), g, n, up)
           for (u, a, b, g, n, up) in _hb_oracle(pdf, 600)]
    assert got == exp and len(got) > 0


def test_heartbeat_gaps_boundary_and_validation(spark):
    from ts2g2_spark.operators.eventseq import heartbeat_gaps

    base = TS(2024, 1, 1)
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1],
        # gaps: exactly 600s (NOT a gap), 601s (a gap)
        "ts": [base, base + dt.timedelta(seconds=600),
               base + dt.timedelta(seconds=1201)],
        "value": [1.0, 2.0, 3.0],
        "event_id": np.arange(3, dtype=np.int64),
    })
    rows = heartbeat_gaps(spark.createDataFrame(pdf), gap_s=600,
                          order_col="event_id").collect()
    assert len(rows) == 1 and rows[0].gap_us == 601_000_000
    assert rows[0].uptime_pct == round(100.0 * (1 - 601 / 1201), 6)
    with pytest.raises(ValueError, match="gap_s"):
        heartbeat_gaps(spark.createDataFrame(pdf), gap_s=0)


# -------------------------------------------------------------- bursts

def _burst_oracle(pdf, bucket_s=3600, s=3.0, gamma=1.0, dp=9):
    """Scalar per-series Viterbi reference of the quantized automaton."""
    sc = 10.0 ** dp

    def q(x):
        return np.floor(x * sc + 0.5) / sc

    rows = []
    p2 = pdf.copy()
    p2["b"] = p2["ts"].dt.floor("h")
    for u, g in p2.groupby("user_id"):
        byb = g.groupby("b").size().sort_index()
        t0, t1 = byb.index[0], byb.index[-1]
        n = int((t1 - t0).total_seconds() // bucket_s) + 1
        cnt = np.zeros(n, dtype=np.int64)
        idx = ((byb.index - t0).total_seconds() // bucket_s).astype(int)
        cnt[idx] = byb.to_numpy()
        l0 = cnt.sum() / n
        l1 = s * l0
        gg = gamma * np.log(n)
        c0 = q(l0 - cnt[0] * np.log(l0))
        c1 = q(gg + l1 - cnt[0] * np.log(l1))
        ptr = np.zeros((n, 2), dtype=int)
        costs = [(c0, c1)]
        for t in range(1, n):
            p0 = 0 if c0 <= c1 else 1
            p1 = 0 if c0 + gg <= c1 else 1
            n0 = q(l0 - cnt[t] * np.log(l0) + min(c0, c1))
            n1 = q(l1 - cnt[t] * np.log(l1) + min(c0 + gg, c1))
            ptr[t] = (p0, p1)
            c0, c1 = n0, n1
            costs.append((c0, c1))
        st = np.zeros(n, dtype=int)
        st[n - 1] = 1 if c1 < c0 else 0
        for t in range(n - 2, -1, -1):
            st[t] = ptr[t + 1][st[t + 1]]
        for t in range(n):
            rows.append((u, t0 + pd.Timedelta(seconds=t * bucket_s),
                         int(cnt[t]), bool(st[t])))
    return pd.DataFrame(rows, columns=[
        "user_id", "bucket_ts", "cnt", "burst"])


def test_burst_detection_matches_scalar_oracle(spark):
    from ts2g2_spark.operators.eventseq import burst_detection

    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-01-01")
    frames = []
    for u, n in ((1, 400), (2, 90), (3, 15)):
        secs = rng.integers(0, 40 * 3600, n)
        frames.append(pd.DataFrame({
            "user_id": u,
            "ts": base + pd.to_timedelta(secs, unit="s"),
        }))
    pdf = pd.concat(frames, ignore_index=True)
    got = burst_detection(spark.createDataFrame(pdf)).toPandas()
    want = _burst_oracle(pdf)
    keys = ["user_id", "bucket_ts"]
    for df in (got, want):
        df.sort_values(keys, inplace=True, ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in want.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_burst_detection_flags_planted_burst(spark):
    from ts2g2_spark.operators.eventseq import burst_detection

    base = pd.Timestamp("2024-01-01")
    rows = []
    for h in range(48):
        per = 20 if 20 <= h < 26 else 2  # 6-hour 10x burst
        for i in range(per):
            rows.append((1, base + pd.Timedelta(hours=h, seconds=i)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    got = burst_detection(spark.createDataFrame(pdf)).toPandas()
    got = got.sort_values("bucket_ts", ignore_index=True)
    assert len(got) == 48
    assert got.burst[20:26].all()          # the planted burst
    assert not got.burst[:20].any() and not got.burst[26:].any()
    with pytest.raises(ValueError, match="s > 1"):
        burst_detection(spark.createDataFrame(pdf), s=1.0)
    with pytest.raises(ValueError, match="gamma"):
        burst_detection(spark.createDataFrame(pdf), gamma=-0.5)


def test_user_growth_matches_bruteforce(spark):
    from collections import defaultdict

    from ts2g2_spark.operators.eventseq import user_growth

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = {r.bucket_ts.date(): (r.n_active, r.n_new, r.cum_users)
           for r in user_growth(ev).collect()}
    rows = ev.select("user_id", "ts").collect()
    by_day = defaultdict(set)
    first = {}
    for r in rows:
        d = r.ts.date()
        by_day[d].add(r.user_id)
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    cum, want = 0, {}
    for d in sorted(by_day):
        n_new = sum(1 for u, fd in first.items() if fd == d)
        cum += n_new
        want[d] = (len(by_day[d]), n_new, cum)
    assert out == want
    # the final cumulative equals total distinct users
    assert list(out.values())[-1][2] == len(first) if out else True


def test_user_growth_edges(spark):
    import datetime as dt

    import pandas as pd

    from ts2g2_spark.operators.eventseq import user_growth

    pdf = pd.DataFrame({
        "user_id": [1, 1, 2, None, 3],
        "ts": [dt.datetime(2024, 1, 1, 5), dt.datetime(2024, 1, 2, 6),
               dt.datetime(2024, 1, 2, 7), dt.datetime(2024, 1, 3, 8),
               None],
    })
    df = spark.createDataFrame(pdf)
    rows = {r.bucket_ts.day: r for r in user_growth(df).collect()}
    # day1: u1 new; day2: u1 returning + u2 new; null user/ts dropped
    assert (rows[1].n_active, rows[1].n_new, rows[1].cum_users) == (1, 1, 1)
    assert (rows[2].n_active, rows[2].n_new, rows[2].cum_users) == (2, 1, 2)
    assert 3 not in rows
    assert user_growth(df.limit(0)).count() == 0
