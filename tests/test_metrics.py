"""Monitoring-tier rollup math (time-weighted avg, counter rate) vs
brute-force numpy oracles."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

TS = dt.datetime
BASE = TS(2024, 1, 1)


def _events(seed=71, n=400, n_keys=5):
    rng = np.random.default_rng(seed)
    secs = rng.integers(0, 30_000, n)
    return pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "ts": [BASE + dt.timedelta(seconds=int(s)) for s in secs],
        "value": rng.normal(50, 20, n).round(2),
        "event_id": np.arange(n, dtype=np.int64),
    })


def _twa_oracle(pdf, bucket_s=3600):
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy() // 1000  # us
        v = g["value"].to_numpy(float)
        bk = (ts // (bucket_s * 1_000_000)) * bucket_s * 1_000_000
        for b in np.unique(bk):
            idx = np.where(bk == b)[0]
            area = span = 0.0
            for i in idx:
                if i + 1 < len(ts) and bk[i + 1] == b:
                    d = float(ts[i + 1] - ts[i])
                    area += (v[i] + v[i + 1]) / 2 * d
                    span += d
            twa = area / span if span > 0 else v[idx].mean()
            out[(u, int(b))] = (len(idx), int(span), round(twa, 6))
    return out


def test_twa_matches_bruteforce(spark):
    from ts2g2_spark.operators.metrics import time_weighted_avg

    pdf = _events()
    rows = time_weighted_avg(spark.createDataFrame(pdf), bucket="hour",
                             order_col="event_id").collect()
    got = {(r.user_id, int(r.bucket_ts.replace(
        tzinfo=dt.timezone.utc).timestamp() * 1e6)):
           (r.n_points, r.span_us, r.twa) for r in rows}
    exp = _twa_oracle(pdf)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == exp[k][1], k
        assert got[k][2] == pytest.approx(exp[k][2], abs=1e-5), k


def test_twa_oversampled_spike_vs_plain_avg(spark):
    # the operator's reason to exist: 100 samples during a 10s spike
    # must NOT dominate an hour that sat at 10 the rest of the time
    from ts2g2_spark.operators.metrics import time_weighted_avg

    rows = [(1, BASE, 10.0), (1, BASE + dt.timedelta(minutes=50), 10.0)]
    rows += [(1, BASE + dt.timedelta(minutes=50, seconds=1 + i * 0.1),
              1000.0) for i in range(100)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf["event_id"] = np.arange(len(pdf), dtype=np.int64)
    r = time_weighted_avg(spark.createDataFrame(pdf), bucket="hour",
                          order_col="event_id").collect()[0]
    plain = pdf["value"].mean()
    assert plain > 900           # naive mean is spike-dominated
    assert r.twa < 25            # TWA stays near the true level


def test_twa_singleton_and_coincident_fallback(spark):
    from ts2g2_spark.operators.metrics import time_weighted_avg

    pdf = pd.DataFrame({
        "user_id": [1, 2, 2],
        "ts": [BASE, BASE + dt.timedelta(hours=2),
               BASE + dt.timedelta(hours=2)],
        "value": [7.0, 4.0, 8.0],
        "event_id": np.arange(3, dtype=np.int64),
    })
    got = {r.user_id: r for r in time_weighted_avg(
        spark.createDataFrame(pdf), order_col="event_id").collect()}
    assert got[1].twa == 7.0 and got[1].span_us == 0
    assert got[2].twa == 6.0 and got[2].n_points == 2  # mean fallback


def test_twa_null_values_void_segments(spark):
    # a NULL sample is a gap: segments touching it contribute to
    # neither the integral nor span_us (review fix)
    from ts2g2_spark.operators.metrics import time_weighted_avg

    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": [BASE, BASE + dt.timedelta(seconds=10),
               BASE + dt.timedelta(seconds=20),
               BASE + dt.timedelta(seconds=30),
               BASE, BASE + dt.timedelta(seconds=10)],
        "value": [10.0, 10.0, None, 12.0, 5.0, None],
        "event_id": np.arange(6, dtype=np.int64),
    })
    got = {r.user_id: r for r in time_weighted_avg(
        spark.createDataFrame(pdf), order_col="event_id").collect()}
    # user 1: only the 0s-10s segment survives -> twa 10.0, span 10s
    assert got[1].span_us == 10_000_000 and got[1].twa == 10.0
    assert got[1].n_points == 4
    # user 2: the only segment is voided -> zero span, mean fallback
    # over the non-null points
    assert got[2].span_us == 0 and got[2].twa == 5.0


def _rate_oracle(pdf, bucket_s=3600):
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = g["value"].to_numpy(float)
        ts = g["ts"].astype("int64").to_numpy() // 1000
        bk = (ts // (bucket_s * 1_000_000)) * bucket_s * 1_000_000
        inc = {}
        n = {}
        for i in range(len(v)):
            b = int(bk[i])
            n[b] = n.get(b, 0) + 1
            if i == 0:
                continue
            d = v[i] - v[i - 1] if v[i] >= v[i - 1] else v[i]
            inc[b] = inc.get(b, 0.0) + d
        for b in n:
            out[(u, b)] = (n[b], round(inc.get(b, 0.0), 6))
    return out


def test_counter_rate_matches_bruteforce(spark):
    from ts2g2_spark.operators.metrics import counter_rate

    # cumulative counters with planted resets
    rng = np.random.default_rng(77)
    frames = []
    for u in range(4):
        n = 120
        secs = np.sort(rng.integers(0, 20_000, n))
        vals = np.cumsum(rng.integers(0, 50, n)).astype(float)
        reset_at = rng.integers(20, n - 20)
        vals[reset_at:] -= vals[reset_at]  # counter restart from 0
        frames.append(pd.DataFrame({
            "user_id": u,
            "ts": [BASE + dt.timedelta(seconds=int(s)) for s in secs],
            "value": vals,
        }))
    pdf = pd.concat(frames, ignore_index=True)
    pdf["event_id"] = np.arange(len(pdf), dtype=np.int64)
    rows = counter_rate(spark.createDataFrame(pdf), bucket="hour",
                        bucket_s=3600, order_col="event_id").collect()
    got = {(r.user_id, int(r.bucket_ts.replace(
        tzinfo=dt.timezone.utc).timestamp() * 1e6)):
           (r.n_points, r.increase, r.rate_per_s) for r in rows}
    exp = _rate_oracle(pdf)
    assert set(got) == set(exp)
    for k, (n, inc) in exp.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(inc, abs=1e-5), k
        assert got[k][2] == pytest.approx(inc / 3600, abs=1e-7), k


def test_counter_rate_reset_and_first_sample(spark):
    from ts2g2_spark.operators.metrics import counter_rate

    pdf = pd.DataFrame({
        "user_id": [1] * 4,
        "ts": [BASE + dt.timedelta(minutes=m) for m in (0, 10, 20, 30)],
        "value": [100.0, 150.0, 30.0, 40.0],  # reset at sample 3
        "event_id": np.arange(4, dtype=np.int64),
    })
    r = counter_rate(spark.createDataFrame(pdf),
                     order_col="event_id").collect()[0]
    # 50 (150-100) + 30 (post-reset value) + 10 (40-30); first sample free
    assert r.increase == 90.0 and r.n_points == 4


def _forecast_oracle(pdf, period=4, horizon=3, bucket_s=3600):
    import math
    out = {}
    for u, g in pdf.groupby("user_id"):
        m = (g.assign(b=g["ts"].dt.floor(f"{bucket_s}s"))
             .groupby("b")["value"].mean().sort_index())
        ts = list(m.index)
        y = list(m.values)
        yl = {}
        for t in ts:
            st = t - pd.Timedelta(seconds=period * bucket_s)
            if st in m.index:
                yl[t] = m[st]
        errs = [abs(m[t] - yl[t]) for t in yl]
        perrs = [abs((m[t] - yl[t]) / m[t]) for t in yl if m[t] != 0]
        mae = round(sum(errs) / len(errs), 6) if errs else None
        mape = round(sum(perrs) / len(perrs), 6) if perrs else None
        last = ts[-1]
        for step in range(1, horizon + 1):
            ft = last + pd.Timedelta(seconds=step * bucket_s)
            st = ft - pd.Timedelta(seconds=period * bucket_s)
            yhat = round(m[st], 6) if st in m.index else None
            out[(u, step)] = (ft, yhat, mae, mape)
    return out


def test_seasonal_naive_forecast_matches_bruteforce(spark):
    from ts2g2_spark.operators.metrics import seasonal_naive_forecast

    pdf = _events(seed=5, n=300, n_keys=4)
    got = {(r.user_id, r.step): (pd.Timestamp(r.bucket_ts), r.yhat,
                                 r.mae, r.mape)
           for r in seasonal_naive_forecast(
               spark.createDataFrame(pdf), period=4, horizon=3).collect()}
    exp = _forecast_oracle(pdf)
    assert set(got) == set(exp)
    for k in exp:
        ft, yhat, mae, mape = exp[k]
        gft, gyhat, gmae, gmape = got[k]
        assert gft == ft, k
        assert gyhat == pytest.approx(yhat, abs=1e-9) if yhat is not None \
            else gyhat is None, k
        assert gmae == pytest.approx(mae, abs=1e-9), k
        assert gmape == pytest.approx(mape, abs=1e-9), k


def test_seasonal_naive_forecast_gap_guard_and_validation(spark):
    from ts2g2_spark.operators.metrics import seasonal_naive_forecast

    # series with a missing bucket: a positional lag-24 would line up
    # the WRONG bucket; the self-join on (bucket_ts - period) stays
    # exact and simply drops pairs whose source bucket is absent
    rows = []
    for hour in [0, 1, 2, 4, 5, 6, 7]:  # hour 3 missing
        rows.append((1, BASE + dt.timedelta(hours=hour), float(hour), hour))
    pdf = pd.DataFrame(rows,
                       columns=["user_id", "ts", "value", "event_id"])
    got = seasonal_naive_forecast(
        spark.createDataFrame(pdf), period=4, horizon=2).collect()
    by_step = {r.step: r for r in got}
    # future buckets: hour 8 (src hour 4 -> 4.0), hour 9 (src hour 5)
    assert by_step[1].yhat == 4.0 and by_step[2].yhat == 5.0
    # backtest pairs: hours 4,5,6 have sources 0,1,2 (hour 7's source
    # hour 3 is missing); errors all |h - (h-4)| = 4 -> mae 4.0
    assert by_step[1].mae == 4.0

    with pytest.raises(ValueError, match="horizon"):
        seasonal_naive_forecast(spark.createDataFrame(pdf),
                                period=4, horizon=5)


def _alert_oracle(pdf, upper, lower):
    out = []
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        st = 0
        for r in g.itertuples():
            nst = 1 if r.value >= upper else (0 if r.value <= lower
                                              else st)
            if nst != st:
                out.append((u, r.ts, r.value,
                            "raise" if nst else "clear"))
            st = nst
    return sorted(out)


@pytest.mark.parametrize("upper,lower", [(70.0, 40.0), (50.0, 50.0)])
def test_threshold_alerts_matches_state_machine(spark, upper, lower):
    from ts2g2_spark.operators.metrics import threshold_alerts

    pdf = _events(seed=13, n=500, n_keys=4)
    got = sorted(
        (r.user_id, pd.Timestamp(r.ts), r.value, r.event)
        for r in threshold_alerts(
            spark.createDataFrame(pdf), upper=upper, lower=lower,
            order_col="event_id").collect())
    exp = [(u, pd.Timestamp(t), v, e)
           for (u, t, v, e) in _alert_oracle(pdf, upper, lower)]
    assert got == exp and len(got) > 0


def test_threshold_alerts_hysteresis_and_validation(spark):
    from ts2g2_spark.operators.metrics import threshold_alerts

    # flapping between the thresholds must NOT re-alert
    vals = [10, 80, 60, 65, 75, 30, 85, 90, 20]  # raise..holds..clear..raise..clear
    pdf = pd.DataFrame({
        "user_id": [1] * len(vals),
        "ts": [BASE + dt.timedelta(minutes=i) for i in range(len(vals))],
        "value": [float(v) for v in vals],
        "event_id": np.arange(len(vals), dtype=np.int64),
    })
    got = [(r.value, r.event) for r in threshold_alerts(
        spark.createDataFrame(pdf), upper=70, lower=40,
        order_col="event_id").orderBy("ts").collect()]
    assert got == [(80.0, "raise"), (30.0, "clear"), (85.0, "raise"),
                   (20.0, "clear")]

    with pytest.raises(ValueError, match="lower <= upper"):
        threshold_alerts(spark.createDataFrame(pdf), upper=10, lower=20)


# --------------------------------------------------------------- holt

def _holt_oracle(pdf, alpha, beta, horizon, dp=9, out_dp=6):
    """Scalar per-series reference of the quantized Holt recurrence."""
    s, so = 10.0 ** dp, 10.0 ** out_dp

    def q(x, sc):
        return np.floor(x * sc + 0.5) / sc

    rows = []
    pdf = pdf.copy()
    pdf["b"] = pdf["ts"].dt.floor("h")
    for u, g in pdf.groupby("user_id"):
        m = g.groupby("b")["value"].mean().round(6).sort_index()
        y = m.to_numpy()
        if len(y) < 2:
            continue
        lvl, trd = y[0], q(y[1] - y[0], s)
        for t in range(1, len(y)):
            l_new = q(alpha * y[t] + (1 - alpha) * (lvl + trd), s)
            trd = q(beta * (l_new - lvl) + (1 - beta) * trd, s)
            lvl = l_new
        for h in range(1, horizon + 1):
            rows.append((u, m.index[-1] + dt.timedelta(hours=h), h,
                         q(lvl + h * trd, so) + 0.0, lvl + 0.0, trd + 0.0))
    return pd.DataFrame(rows, columns=[
        "user_id", "bucket_ts", "step", "yhat", "level", "trend"])


def test_holt_forecast_matches_scalar_oracle(spark):
    """The across-series vectorized kernel (NaN padding + lane masks)
    reproduces the scalar per-series recurrence bit-for-bit, on series
    of very different lengths."""
    from ts2g2_spark.operators.metrics import holt_forecast

    pdf = _events(seed=5, n=600, n_keys=7)
    # make series lengths wildly uneven: drop most points for some users
    pdf = pdf[(pdf.user_id > 2) | (pdf.index % 11 == 0)].reset_index()
    got = holt_forecast(spark.createDataFrame(pdf[
        ["user_id", "ts", "value"]]), alpha=0.3, beta=0.1,
        horizon=8).toPandas()
    want = _holt_oracle(pdf, 0.3, 0.1, 8)
    for df in (got, want):
        df.sort_values(["user_id", "step"], inplace=True,
                       ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    for c in want.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_holt_forecast_two_points_and_skips(spark):
    """A 2-bucket series forecasts the straight line y2 + h*(y2-y1);
    1-bucket series are skipped."""
    from ts2g2_spark.operators.metrics import holt_forecast

    pdf = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": [BASE, BASE + dt.timedelta(hours=1),
               BASE + dt.timedelta(hours=2)],
        "value": [10.0, 13.0, 99.0],
    })
    got = holt_forecast(spark.createDataFrame(pdf), alpha=0.5, beta=0.5,
                        horizon=3).toPandas()
    assert set(got.user_id) == {1}
    got = got.sort_values("step")
    assert np.array_equal(got.yhat.to_numpy(), [16.0, 19.0, 22.0])
    assert (got.level == 13.0).all() and (got.trend == 3.0).all()


def test_holt_forecast_validation(spark):
    from ts2g2_spark.operators.metrics import holt_forecast

    df = spark.createDataFrame(_events(n=20))
    with pytest.raises(ValueError, match="alpha"):
        holt_forecast(df, alpha=0.0)
    with pytest.raises(ValueError, match="horizon"):
        holt_forecast(df, horizon=0)
    with pytest.raises(ValueError, match="contradicts"):
        holt_forecast(df, bucket="hour", bucket_s=60)
    with pytest.raises(ValueError, match="non-fixed-length"):
        holt_forecast(df, bucket="month")


# ---------------------------------------------------------------- psi

def test_psi_drift_matches_scalar_oracle(spark):
    from ts2g2_spark.operators.metrics import psi_drift

    pdf = _events(seed=31, n=900, n_keys=4)
    pdf["event_type"] = "t" + (pdf.pop("user_id") % 3).astype(str)
    # spread across 4 days so consecutive-day pairs exist
    pdf["ts"] = pdf["ts"] + pd.to_timedelta(
        pdf["event_id"] % 4, unit="D")
    lo, hi, nb = 0.0, 120.0, 6
    got = psi_drift(spark.createDataFrame(
        pdf[["event_type", "ts", "value"]]), lo, hi, nb).toPandas()

    width = (hi - lo) / nb
    rows = []
    p2 = pdf.copy()
    p2["day"] = p2["ts"].dt.floor("D")
    p2["bin"] = np.where(
        p2.value < lo, -1,
        np.where(p2.value >= hi, nb,
                 np.floor((p2.value - lo) / width))).astype(int)
    for et, g in p2.groupby("event_type"):
        days = sorted(g.day.unique())
        for d0, d1 in zip(days, days[1:]):
            if (d1 - d0) != pd.Timedelta(days=1):
                continue
            psi = 0.0
            for b in range(-1, nb + 1):
                q = max(len(g[(g.day == d0) & (g.bin == b)])
                        / len(g[g.day == d0]), 1e-6)
                p = max(len(g[(g.day == d1) & (g.bin == b)])
                        / len(g[g.day == d1]), 1e-6)
                psi += (p - q) * np.log(p / q)
            psi = float(np.round(psi, 6)) + 0.0
            rows.append((et, d1, psi))
    want = pd.DataFrame(rows, columns=["event_type", "day", "psi"])
    for df in (got, want):
        df.sort_values(["event_type", "day"], inplace=True,
                       ignore_index=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got.event_type == want.event_type).all()
    assert np.allclose(got.psi.to_numpy(), want.psi.to_numpy(),
                       atol=2e-6)
    lab = np.where(got.psi >= 0.2, "major",
                   np.where(got.psi >= 0.1, "moderate", "stable"))
    assert (got.drift == lab).all()


def test_psi_drift_detects_shift_and_validates(spark):
    from ts2g2_spark.operators.metrics import psi_drift

    # day 1 values ~10, day 2 values ~90: massive drift
    pdf = pd.DataFrame({
        "event_type": "a",
        "ts": [BASE + dt.timedelta(hours=i) for i in range(12)]
        + [BASE + dt.timedelta(days=1, hours=i) for i in range(12)],
        "value": [10.0] * 12 + [90.0] * 12,
    })
    got = psi_drift(spark.createDataFrame(pdf), 0.0, 100.0, 10).collect()
    assert len(got) == 1 and got[0].drift == "major"
    # identical distributions: psi == 0
    pdf2 = pdf.copy()
    pdf2["value"] = 42.0
    got2 = psi_drift(spark.createDataFrame(pdf2), 0.0, 100.0, 10).collect()
    assert got2[0].psi == 0.0 and got2[0].drift == "stable"
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(spark.createDataFrame(pdf), 0.0, 100.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        psi_drift(spark.createDataFrame(pdf), 5.0, 5.0, 4)


def test_winsorized_mean_hand_case(spark):
    import pandas as pd
    import datetime as dt
    import numpy as np
    import pytest
    from ts2g2_spark.operators.metrics import winsorized_mean

    base = dt.datetime(2024, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]  # one outlier in one bucket
    pdf = pd.DataFrame({
        "user_id": [1] * 5,
        "ts": [base + dt.timedelta(minutes=i) for i in range(5)],
        "value": vals,
    })
    r = winsorized_mean(spark.createDataFrame(pdf),
                        bucket="hour").collect()[0]
    lo, hi = np.quantile(vals, 0.1), np.quantile(vals, 0.9)
    want = float(np.mean(np.clip(vals, lo, hi)))
    assert r["n"] == 5 and r["n_clamped"] == 2
    assert r["p_lo"] == pytest.approx(lo, abs=1e-6)
    assert r["p_hi"] == pytest.approx(hi, abs=1e-6)
    assert r["wmean"] == pytest.approx(want, abs=1e-6)
    # no outliers, wide clamp -> plain mean, nothing clamped
    r2 = winsorized_mean(spark.createDataFrame(pdf), bucket="hour",
                         lower=0.0, upper=1.0).collect()[0]
    assert r2["n_clamped"] == 0
    assert r2["wmean"] == pytest.approx(np.mean(vals), abs=1e-6)
    with pytest.raises(ValueError, match="lower"):
        winsorized_mean(None, lower=0.9, upper=0.1)


def _hw_model(y, m, alpha, beta, gamma):
    """The documented holt_winters contract, scalar reference."""
    import numpy as np
    from ts2g2_spark.operators.kernels import quantize_ieee

    def q(x):
        return quantize_ieee(x, 9)

    acc1 = 0.0
    acc2 = 0.0
    for i in range(m):
        acc1 = float(q(acc1 + y[i]))
        acc2 = float(q(acc2 + y[m + i]))
    mean1, mean2 = float(q(acc1 / m)), float(q(acc2 / m))
    lvl, trd = mean1, float(q((mean2 - mean1) / m))
    s = [float(q(v - mean1)) for v in y[:m]]
    for t in range(m, len(y)):
        s_old = s[t % m]
        l_new = float(q(alpha * (y[t] - s_old) + (1 - alpha) * (lvl + trd)))
        t_new = float(q(beta * (l_new - lvl) + (1 - beta) * trd))
        s[t % m] = float(q(gamma * (y[t] - l_new) + (1 - gamma) * s_old))
        lvl, trd = l_new, t_new
    rolled = [s[(len(y) + j) % m] for j in range(m)]
    return lvl, trd, rolled


def test_holt_winters_matches_scalar_model(spark):
    import datetime as dt
    import math
    import numpy as np
    import pandas as pd
    import pytest
    from ts2g2_spark.operators.metrics import holt_winters_forecast

    base = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(13)
    m = 6
    rows = []
    for u in (1, 2):
        n = 40 if u == 1 else 11  # user 2: < 2*m buckets -> skipped
        for i in range(n):
            v = (10 + 0.2 * i + 3 * math.sin(2 * math.pi * i / m)
                 + rng.normal(0, 0.2))
            rows.append((u, base + dt.timedelta(hours=i), round(v, 2)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    got = holt_winters_forecast(
        spark.createDataFrame(pdf), period=m, alpha=0.3, beta=0.1,
        gamma=0.2, horizon=8).collect()
    assert {r["user_id"] for r in got} == {1}  # user 2 skipped
    y = [round(v, 6) for v in
         pdf[pdf.user_id == 1].sort_values("ts")["value"]]
    lvl, trd, s = _hw_model(y, m, 0.3, 0.1, 0.2)
    by_step = {r["step"]: r for r in got if r["user_id"] == 1}
    assert len(by_step) == 8
    for h in range(1, 9):
        r = by_step[h]
        assert r["level"] == lvl and r["trend"] == trd
        assert r["seasonal"] == s[(h - 1) % m]
        want = math.floor((lvl + h * trd + s[(h - 1) % m]) * 1e6
                          + 0.5) / 1e6
        assert r["yhat"] == want, h
        assert r["bucket_ts"] == base + dt.timedelta(hours=39 + h)
    # a pure seasonal+trend series forecasts its own continuation
    clean = pd.DataFrame(
        [(1, base + dt.timedelta(hours=i),
          5.0 + 0.5 * i + [0, 2, -2][i % 3]) for i in range(36)],
        columns=["user_id", "ts", "value"])
    fc = {r["step"]: r["yhat"] for r in holt_winters_forecast(
        spark.createDataFrame(clean), period=3, alpha=0.5, beta=0.1,
        gamma=0.3, horizon=3).collect()}
    for h in (1, 2, 3):
        i = 36 + h - 1
        truth = 5.0 + 0.5 * i + [0, 2, -2][i % 3]
        assert fc[h] == pytest.approx(truth, abs=0.5), h
    with pytest.raises(ValueError, match="period"):
        holt_winters_forecast(None, period=1)
    with pytest.raises(ValueError, match="gamma"):
        holt_winters_forecast(None, gamma=0.0)


def test_slo_burn_rate_windows_and_alert(spark):
    """Hand-built minute stream: burn rates = exact trailing-window
    ratios / budget; alert needs BOTH windows over the factor; gaps in
    the grid do not break the trailing RANGE windows."""
    import datetime as dt
    import pandas as pd
    from ts2g2_spark.operators.metrics import slo_burn_rate

    T0 = dt.datetime(2024, 1, 1)
    rows = []
    # minutes 0,1,2: healthy (1 evt/min, no errors)
    for m in range(3):
        rows.append((T0 + dt.timedelta(minutes=m, seconds=5), False))
    # minutes 3,4: full outage (2 evts/min, all errors)
    for m in (3, 4):
        for s in (1, 31):
            rows.append((T0 + dt.timedelta(minutes=m, seconds=s), True))
    # minute 10 (after a gap): healthy again
    rows.append((T0 + dt.timedelta(minutes=10), False))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "is_error"]))
    out = (slo_burn_rate(ev, slo=0.9, short_s=120, long_s=300,
                         factor=5.0)
           .toPandas().sort_values("bucket_ts", ignore_index=True))
    budget = 1.0 - 0.9
    # minute 4: short window = minutes 3-4 -> 4/4 errors
    m4 = out.iloc[4]
    assert m4.err_short == 4 and m4.total_short == 4
    assert m4.burn_short == round((4 / 4) / budget, 6) == 10.0
    # long window at minute 4 = minutes 0-4 -> 4 errors of 7 events
    assert m4.err_long == 4 and m4.total_long == 7
    assert bool(m4.alert) == bool(m4.burn_short >= 5.0
                                  and m4.burn_long >= 5.0)
    assert bool(m4.alert) is True
    # minute 3: short = minutes 2-3 -> 2/3; long = 0-3 -> 2/5
    m3 = out.iloc[3]
    assert (m3.err_short, m3.total_short) == (2, 3)
    assert (m3.err_long, m3.total_long) == (2, 5)
    # healthy head: burn 0, no alert
    assert not out.iloc[0].alert and out.iloc[0].burn_short == 0.0
    # minute 10: both trailing windows reach back across the gap but
    # past the outage (range is on epoch, not row offsets)
    m10 = out.iloc[5]
    assert (m10.err_short, m10.total_short) == (0, 1)
    assert (m10.err_long, m10.total_long) == (0, 1)
    assert not m10.alert

    with pytest.raises(ValueError):
        slo_burn_rate(ev, slo=1.5)
    with pytest.raises(ValueError):
        slo_burn_rate(ev, short_s=3600, long_s=300)


def test_ar2_forecast_matches_numpy(spark):
    """ar2_forecast == a numpy Yule-Walker replay on hourly means; the
    fitted phis recover a planted AR(2) signal's dynamics."""
    import numpy as np
    import pandas as pd
    from ts2g2_spark.operators.metrics import ar2_forecast

    rng = np.random.default_rng(3)
    n = 200
    y = np.zeros(n)
    for t in range(2, n):  # planted AR(2): phi = (0.6, -0.3)
        y[t] = 0.6 * y[t-1] - 0.3 * y[t-2] + rng.normal(0, 0.5)
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
        "value": y,
    })
    out = (ar2_forecast(spark.createDataFrame(pdf), horizon=4)
           .toPandas().sort_values("h", ignore_index=True))
    yb = np.round(y, 6)  # bucket means = the rounded points (1/bucket)
    ybar = yb.sum() / n
    d = yb - ybar
    c0 = (d * d).sum()
    c1 = (d[1:] * d[:-1]).sum()
    c2 = (d[2:] * d[:-2]).sum()
    r1, r2 = c1 / c0, c2 / c0
    p1 = r1 * (1 - r2) / (1 - r1 * r1)
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert out.phi1[0] == pytest.approx(p1, abs=2e-6)
    assert out.phi2[0] == pytest.approx(p2, abs=2e-6)
    assert abs(p1 - 0.6) < 0.15 and abs(p2 + 0.3) < 0.15
    f_prev2, f_prev1, want = d[-2], d[-1], []
    for _ in range(4):
        f = p1 * f_prev1 + p2 * f_prev2
        want.append(ybar + f)
        f_prev2, f_prev1 = f_prev1, f
    assert list(out.h) == [1, 2, 3, 4]
    for k in range(4):
        assert out.forecast[k] == pytest.approx(want[k], abs=2e-6)


def test_ar2_forecast_edges(spark):
    import pandas as pd
    from ts2g2_spark.operators.metrics import ar2_forecast

    # constant series: flat ybar forecast, phi = 0
    pdf = pd.DataFrame({
        "user_id": [1] * 10,
        "ts": pd.date_range("2024-01-01", periods=10, freq="h"),
        "value": [7.5] * 10,
    })
    out = ar2_forecast(spark.createDataFrame(pdf), horizon=3).toPandas()
    assert len(out) == 3
    assert (out.forecast == 7.5).all()
    assert (out.phi1 == 0.0).all() and (out.phi2 == 0.0).all()
    # fewer than 3 buckets: no rows
    short = spark.createDataFrame(pdf.head(2))
    assert ar2_forecast(short).count() == 0
    with pytest.raises(ValueError):
        ar2_forecast(spark.createDataFrame(pdf), horizon=0)


def test_ks_drift_matches_scipy_formula(spark):
    """ks_d == the exact two-sample KS statistic (numpy replay); a
    planted distribution shift flags drift, a stable pair does not."""
    import numpy as np
    import pandas as pd
    from ts2g2_spark.operators.metrics import ks_drift

    rng = np.random.default_rng(0)  # seed with clear margins on both
    d1 = rng.normal(0, 1, 400)      # day 1
    d2 = rng.normal(0, 1, 350)      # day 2: same dist -> no drift
    d3 = rng.normal(2, 1, 300)      # day 3: shifted -> drift
    rows = []
    for day, data in ((1, d1), (2, d2), (3, d3)):
        for i, x in enumerate(data):
            rows.append(("a", dt.datetime(2024, 1, day, i % 24), x))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    out = {r["day"].day: r for r in ks_drift(
        spark.createDataFrame(pdf)).collect()}
    assert set(out) == {2, 3}

    def ks(a, b):
        allv = np.sort(np.unique(np.concatenate([a, b])))
        fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        return np.abs(fa - fb).max()

    assert out[2]["ks_d"] == pytest.approx(ks(d2, d1), abs=2e-6)
    assert out[3]["ks_d"] == pytest.approx(ks(d3, d2), abs=2e-6)
    assert not out[2]["drift"] and out[3]["drift"]
    assert out[2]["n_today"] == 350 and out[2]["n_prev"] == 400
    # crit = 1.358 * sqrt((np+nq)/(np*nq))
    want = 1.358 * np.sqrt((350 + 400) / (350.0 * 400.0))
    assert out[2]["crit"] == pytest.approx(want, abs=2e-6)


def test_ks_drift_edges(spark):
    import pandas as pd
    from ts2g2_spark.operators.metrics import ks_drift

    # identical days -> D = 0; a lone day (no previous) emits nothing
    pdf = pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 2,
        "ts": [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 5),
               dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 5),
               dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 3)],
        "value": [1.0, 2.0, 1.0, 2.0, 9.0, 9.0],
    })
    rows = ks_drift(spark.createDataFrame(pdf)).collect()
    assert len(rows) == 1
    assert rows[0]["event_type"] == "a" and rows[0]["ks_d"] == 0.0
    assert not rows[0]["drift"]


def test_counter_rate_resets_and_changes_counts(spark):
    """n_resets counts strict drops (PromQL resets()); n_changes counts
    any value change (PromQL changes()); first samples count neither."""
    from ts2g2_spark.operators.metrics import counter_rate

    pdf = pd.DataFrame({
        "user_id": [1] * 6,
        "ts": [BASE + dt.timedelta(minutes=m)
               for m in (0, 10, 20, 30, 40, 50)],
        "value": [100.0, 150.0, 150.0, 30.0, 30.0, 45.0],
        "event_id": np.arange(6, dtype=np.int64),
    })
    r = counter_rate(spark.createDataFrame(pdf),
                     order_col="event_id").collect()[0]
    assert r.n_resets == 1      # 150 -> 30
    assert r.n_changes == 3     # 100->150, 150->30, 30->45
    assert r.increase == 95.0   # 50 + 0 + 30 + 0 + 15


def _mase_bruteforce(vals, period):
    se = [abs(vals[t] - vals[t - period]) for t in range(period, len(vals))]
    ne = [abs(vals[t] - vals[t - 1]) for t in range(1, len(vals))]
    if not se or not ne or sum(ne) == 0:
        return None
    return (sum(se) / len(se)) / (sum(ne) / len(ne))


def test_mase_backtest_matches_bruteforce(spark):
    from ts2g2_spark.operators.metrics import mase_backtest

    rng = np.random.default_rng(17)
    rows = []
    series = {}
    for key, periodic in (("a", True), ("b", False)):
        base = (np.tile(np.arange(24) * 100, 8) if periodic
                else rng.integers(0, 2000, 192))
        vals = (base + rng.integers(0, 10, 192)).astype(int).tolist()
        series[key] = vals
        rows += [(key, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r.k: r for r in mase_backtest(
        df, 24, series_cols=("k",), order_col="t").collect()}
    for key, vals in series.items():
        want = _mase_bruteforce(vals, 24)
        r = out[key]
        assert r.n == 192 and r.n_seasonal == 168 and r.n_naive == 191
        assert r.mase == pytest.approx(want, abs=1e-6)
    # the strongly periodic series must beat persistence decisively
    assert out["a"].mase < 0.5 < out["b"].mase


def test_mase_backtest_edges(spark):
    from ts2g2_spark.operators.metrics import mase_backtest

    # constant series: naive error sum 0 -> NULL mase
    const = spark.createDataFrame(
        [("c", t, 7) for t in range(10)], "k string, t long, v long")
    r = mase_backtest(const, 3, ("k",), "t").collect()[0]
    assert r.mase is None and r.sum_abs_err_naive == 0

    # series shorter than period: no seasonal pairs -> NULL
    short = spark.createDataFrame(
        [("s", t, t * 10) for t in range(4)], "k string, t long, v long")
    r = mase_backtest(short, 9, ("k",), "t").collect()[0]
    assert r.n_seasonal == 0 and r.mase is None

    # single row / empty / validation
    one = spark.createDataFrame([("o", 0, 5)], "k string, t long, v long")
    assert mase_backtest(one, 2, ("k",), "t").collect()[0].mase is None
    assert mase_backtest(one.limit(0), 2, ("k",), "t").count() == 0
    with pytest.raises(ValueError, match="period"):
        mase_backtest(one, 0, ("k",), "t")


def _ols_predict(ts, ys, t_eval, horizon):
    """Brute-force least squares over the trailing window, numpy lstsq."""
    x = np.asarray(ts, float) - t_eval
    y = np.asarray(ys, float)
    A = np.vstack([x, np.ones_like(x)]).T
    slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
    return slope, intercept + slope * horizon


def test_predict_linear_matches_lstsq(spark):
    from ts2g2_spark.operators.metrics import predict_linear

    rng = np.random.default_rng(23)
    t0 = dt.datetime(2026, 1, 1)
    rows, truth = [], {}
    for key, drift in (("up", 7), ("down", -3)):
        vals = 100000 + drift * np.arange(120) * 60 \
            + rng.integers(-500, 500, 120)
        for i, v in enumerate(vals):
            rows.append((key, t0 + dt.timedelta(minutes=i), int(v)))
        truth[key] = vals
    df = spark.createDataFrame(
        rows, "k string, bucket_ts timestamp, v long")
    out = predict_linear(df, range_s=3600, horizon_s=7200,
                         series_cols=("k",))
    got = {(r.k, r.bucket_ts): r for r in out.collect()}
    assert len(got) == 240
    for key, vals in truth.items():
        for i in (0, 1, 59, 119):
            r = got[(key, t0 + dt.timedelta(minutes=i))]
            lo = max(0, i - 59)
            ts = [j * 60 for j in range(lo, i + 1)]
            assert r.n_samples == i - lo + 1
            if r.n_samples < 2:
                assert r.slope is None and r.predicted is None
                continue
            slope, pred = _ols_predict(
                ts, vals[lo:i + 1], i * 60, 7200)
            assert r.slope == pytest.approx(slope, abs=1e-5)
            assert r.predicted == pytest.approx(pred, abs=1e-3)


def test_predict_linear_gaps_and_guards(spark):
    from ts2g2_spark.operators.metrics import predict_linear

    t0 = dt.datetime(2026, 1, 1)
    # occupied buckets 0, 1, 90 (60-bucket gap): the window at bucket
    # 90 only sees itself -> degenerate, NULL prediction
    df = spark.createDataFrame(
        [("k", t0, 100), ("k", t0 + dt.timedelta(minutes=1), 160),
         ("k", t0 + dt.timedelta(minutes=90), 400)],
        "k string, bucket_ts timestamp, v long")
    rows = {r.bucket_ts: r for r in predict_linear(
        df, range_s=3600, horizon_s=600,
        series_cols=("k",)).collect()}
    assert len(rows) == 3
    r1 = rows[t0 + dt.timedelta(minutes=1)]
    # exact 2-point line: slope 1/s, predict 160 + 600
    assert r1.n_samples == 2 and r1.slope == 1.0 and r1.predicted == 760.0
    r90 = rows[t0 + dt.timedelta(minutes=90)]
    assert r90.n_samples == 1 and r90.slope is None
    with pytest.raises(ValueError, match="grid"):
        predict_linear(df, grid="week")
    with pytest.raises(ValueError, match="grid_s"):
        predict_linear(df, grid="hour", grid_s=60)
    with pytest.raises(ValueError, match="multiple"):
        predict_linear(df, range_s=90)
    with pytest.raises(ValueError, match="horizon"):
        predict_linear(df, horizon_s=-1)
