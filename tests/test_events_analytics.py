"""Semantic invariants for the event-analytics queries (cohort
retention, transition matrix, per-group mode). Oracle value equality
is covered by tools/check_correctness.py; these pin the properties
that must hold for ANY input."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_CORRECT, SF_SMOKE

import __spark_entry__ as entrymod

Q = entrymod.queries()


def test_retention_cohort_day0_is_cohort_size(spark):
    from kinesis_s3_spark.operators.events import events_retention_cohorts

    rows = events_retention_cohorts(spark, SF_SMOKE).collect()
    assert rows
    by_cohort = defaultdict(dict)
    for r in rows:
        assert r["day_offset"] >= 0
        assert r["n_active"] > 0
        by_cohort[r["cohort_day"]][r["day_offset"]] = r["n_active"]
    for cohort, offsets in by_cohort.items():
        # every cohort member is active on their first day, so the
        # offset-0 row exists and bounds every later offset
        assert 0 in offsets, f"cohort {cohort} missing day-0 row"
        assert offsets[0] == max(offsets.values())


def test_transition_matrix_rows_normalize(spark):
    from kinesis_s3_spark.operators.events import events_transition_matrix

    rows = events_transition_matrix(spark, SF_SMOKE).collect()
    assert rows
    p_by_prev = defaultdict(float)
    for r in rows:
        assert r["n"] > 0
        assert 0.0 < r["p"] <= 1.0
        p_by_prev[r["prev_type"]] += r["p"]
    for prev, total in p_by_prev.items():
        assert abs(total - 1.0) < 1e-4, f"{prev} probabilities sum to {total}"


def test_mode_per_user_bounds(spark):
    from kinesis_s3_spark.operators.misc import agg_mode_per_user
    from kinesis_s3_spark.sources.tables import load_table

    rows = agg_mode_per_user(spark, SF_SMOKE).collect()
    n_users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert len(rows) == n_users
    for r in rows:
        assert r["modal_type"]
        assert r["n_modal"] >= 1


def test_drift_chi2_matches_scipy_free_reference(spark):
    """Recompute the chi-square statistic driver-side from the raw
    counts (pure python, no scipy) and compare; also sanity-check the
    contingency totals."""
    rows = Q["events_drift_chi2"](spark, SF_CORRECT).collect()
    t_we = sum(r["n_weekend"] for r in rows)
    t_wd = sum(r["n_weekday"] for r in rows)
    assert t_we > 0 and t_wd > 0
    chi2 = 0.0
    for r in rows:
        n = r["n_weekend"] + r["n_weekday"]
        e_we = n * t_we / (t_we + t_wd)
        e_wd = n * t_wd / (t_we + t_wd)
        contrib = (r["n_weekend"] - e_we) ** 2 / e_we + (r["n_weekday"] - e_wd) ** 2 / e_wd
        assert abs(round(contrib, 6) - r["chi2_contrib"]) < 1e-9, r
        chi2 += round(contrib, 6)
    for r in rows:
        assert abs(r["chi2_total"] - round(chi2, 6)) < 1e-6
        assert r["drifted"] == (chi2 > 9.488)


def test_drift_psi_contribs_nonnegative_and_sum(spark):
    """PSI is termwise non-negative ((a-b) and ln(a/b) share sign);
    recompute each smoothed contribution driver-side and check the
    decimal-summed total and the 0.2 verdict."""
    rows = Q["events_drift_psi"](spark, SF_CORRECT).collect()
    t_ref = sum(r["n_ref"] for r in rows)
    t_cur = sum(r["n_cur"] for r in rows)
    psi = 0.0
    import math

    for r in rows:
        p_ref = (r["n_ref"] + 1) / (t_ref + 10)
        p_cur = (r["n_cur"] + 1) / (t_cur + 10)
        contrib = (p_cur - p_ref) * math.log(p_cur / p_ref)
        assert contrib >= 0
        assert abs(round(contrib, 6) - r["psi_contrib"]) < 1e-9, r
        psi += round(contrib, 6)
    for r in rows:
        assert abs(r["psi_total"] - round(psi, 6)) < 1e-6
        assert r["drifted"] == (psi > 0.2)


def test_session_window_boundary_is_inclusive(spark):
    """Pin the native session_window boundary the oracle relies on:
    an event arriving at EXACTLY last + gap still MERGES into the
    session (only a strictly larger gap opens a new one) — so the
    oracle's strict > matches the built-in."""
    import datetime as dt

    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0),
        ("u1", t0 + dt.timedelta(seconds=1800)),  # exactly the gap
        ("u2", t0),
        ("u2", t0 + dt.timedelta(seconds=1800, microseconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp_ntz")
    sess = (
        df.groupBy("user_id", F.session_window("ts", "1800 seconds"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    by = {r["user_id"]: r["count"] for r in sess}
    assert by == {"u1": 1, "u2": 2}, by


def test_cusum_fires_on_sustained_small_shift(spark):
    """A +1sigma sustained shift that never crosses a 3sigma per-point
    z-test must still drive the windowed CUSUM over its 4sigma alarm
    line — the detector's reason to exist. Construction: 400 baseline
    points alternating +/-1 (mu=0, sigma=1), then 64 points at +1.2."""
    import pyspark.sql.functions as F

    from kinesis_s3_spark.operators.events import _CUSUM_W

    rows = []
    for i in range(400):
        rows.append((i, 1.0 if i % 2 else -1.0))
    for i in range(400, 400 + _CUSUM_W):
        rows.append((i, 1.2))
    df = spark.createDataFrame(rows, "i long, x double")
    mu = 0.0
    sigma_row = df.agg(
        (F.sum(F.col("x") * F.col("x")) / F.count("*")).alias("q")
    ).collect()[0]
    sigma = sigma_row["q"] ** 0.5
    w = (
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("i")
        .rowsBetween(-(_CUSUM_W - 1), 0)
    )
    k = mu + 0.5 * sigma
    cs = df.select(
        "i",
        F.aggregate(
            F.collect_list("x").over(w),
            F.lit(0.0),
            lambda a, b: F.greatest(a + b - k, F.lit(0.0)),
        ).alias("s"),
    )
    mx = cs.agg(F.max("s")).collect()[0][0]
    assert mx > 4 * sigma, (mx, 4 * sigma)
    # and every per-point z stays under 3 sigma: max |x - mu| = 1.2
    assert 1.2 < 3 * sigma


def test_asof_nearest_picks_closer_side(spark):
    """Nearest as-of: hand-checkable invariants over the gated output —
    direction matches which side is closer, distance is the min of the
    two sides, and every matched key is a real order of that user."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.operators.events import events_asof_nearest
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = events_asof_nearest(spark, sf)
    rows = out.collect()
    assert rows and all(r["nearest_orderkey"] is not None or r["direction"] is None for r in rows)
    # distances non-negative; direction only from the allowed set
    assert all(r["dist_seconds"] is None or r["dist_seconds"] >= 0 for r in rows)
    assert {r["direction"] for r in rows} <= {"prev", "next", None}

    # every matched orderkey belongs to that user
    o = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderkey").alias("nearest_orderkey")
    )
    bad = (
        out.filter(F.col("nearest_orderkey").isNotNull())
        .join(o, ["user_id", "nearest_orderkey"], "left_anti")
        .count()
    )
    assert bad == 0


def test_pit_features_leakage_safe_vs_python_walk(spark):
    """Point-in-time correctness, recomputed independently: for every
    purchase label, each feature value must be the one carried by the
    latest (ts, event_id)-ordered row of its family STRICTLY before
    the label timestamp — never at or after it (leakage)."""
    from kinesis_s3_spark.operators.events import events_pit_features
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = sorted(
        load_table(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect(),
        key=lambda r: (r["ts"], -(r["event_type"] == "purchase"), r["event_id"]),
    )
    expect = {}
    state: dict[tuple[int, str], float] = {}
    for r in ev:
        if r["event_type"] == "purchase":
            expect[r["event_id"]] = (
                state.get((r["user_id"], "view")),
                state.get((r["user_id"], "click")),
            )
        if r["event_type"] in ("view", "click"):
            state[(r["user_id"], r["event_type"])] = r["value"]
    got = events_pit_features(spark, sf).collect()
    assert len(got) == len(expect)
    for row in got:
        ev_view, ev_click = expect[row["event_id"]]
        assert row["last_view_value"] == ev_view, row
        assert row["last_click_value"] == ev_click, row


def test_bitmap_distinct_is_exact(spark):
    """The bitmap OR + popcount path is EXACT (not approximate), and
    its word count is bounded by the id-space blocks."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.operators.relational import agg_bitmap_distinct
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = agg_bitmap_distinct(spark, sf).collect()
    assert rows
    max_id = load_table(spark, sf, "events").agg(F.max("user_id")).collect()[0][0]
    for r in rows:
        assert r["bitmap_distinct"] == r["exact_distinct"], r
        assert r["n_words"] <= max_id // 32 + 1


def test_streak_runs_conserve_events(spark):
    """Sum of run lengths per type == event count per type, and a
    direct python single-user recompute agrees at sf0.001."""
    from kinesis_s3_spark.operators.events import events_streak_runs
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in events_streak_runs(spark, sf).collect()}
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    counts: dict[str, int] = {}
    runs: dict[str, int] = {}
    last_by_user: dict[int, str] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        t = r["event_type"]
        counts[t] = counts.get(t, 0) + 1
        if last_by_user.get(r["user_id"]) != t:
            runs[t] = runs.get(t, 0) + 1
        last_by_user[r["user_id"]] = t
    for t, row in got.items():
        assert row["n_runs"] == runs[t], t
        # conservation: n_runs * avg_len == total events of the type
        assert abs(row["n_runs"] * row["avg_len"] - counts[t]) < 1e-3, t
        assert 1 <= row["max_len"]


def test_markov_stationary_is_fixed_point(spark):
    """pi sums to 1, has converged (tiny residual), and matches a
    numpy power-iteration recompute of the same transition matrix."""
    from kinesis_s3_spark.operators.events import events_markov_stationary
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = events_markov_stationary(spark, sf).collect()
    assert abs(sum(r["pi"] for r in rows) - 1.0) < 1e-4
    assert all(r["resid"] <= 0.01 for r in rows)
    assert all(r["pi"] > 0 for r in rows)
    # independent recompute
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    import numpy as np

    trans: dict[tuple[str, str], int] = {}
    prev: dict[int, str] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        p = prev.get(r["user_id"])
        if p is not None:
            trans[(p, r["event_type"])] = trans.get((p, r["event_type"]), 0) + 1
        prev[r["user_id"]] = r["event_type"]
    ts = sorted({i for i, _ in trans} | {j for _, j in trans})
    idx = {t: k for k, t in enumerate(ts)}
    P = np.zeros((len(ts), len(ts)))
    for (i, j), c in trans.items():
        P[idx[i], idx[j]] = c
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(ts), 1.0 / len(ts))
    for _ in range(50):
        pi = pi @ P
    pi = pi / pi.sum()
    for r in rows:
        assert abs(r["pi"] - pi[idx[r["event_type"]]]) < 1e-3, r


def test_recursive_sessions_equal_window_sessionize(spark):
    """The WITH RECURSIVE traversal and the lag+cumsum window plan are
    two formulations of the SAME semantics: their session-length
    distributions must be identical."""
    from kinesis_s3_spark.operators.events import (
        events_recursive_sessions,
        events_sessionize,
    )

    sf = "/root/testdata/sf0.01"
    rec = {
        r["session_len"]: r["n_sessions"]
        for r in events_recursive_sessions(spark, sf).collect()
    }
    win = {}
    for r in events_sessionize(spark, sf).collect():
        win[r["n_events"]] = win.get(r["n_events"], 0) + 1
    assert rec == win


def test_resample_ffill_spine_is_gapfree_and_carries_last(spark):
    """Every user's spine must be hour-contiguous from first to last
    active hour, observed hours must carry their own value, and every
    gap hour must equal the most recent observed hour's value."""
    Q = entrymod.queries()
    rows = Q["events_resample_ffill"](spark, SF_SMOKE).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["hour_start"])
        # contiguous spine: n rows == span hours + 1
        span_h = (rs[-1]["hour_start"] - rs[0]["hour_start"]).total_seconds() / 3600
        assert len(rs) == int(span_h) + 1, u
        # endpoints observed by construction (spine = hourly min..max)
        assert rs[0]["is_observed"] == 1 and rs[-1]["is_observed"] == 1
        last = None
        for r in rs:
            if r["is_observed"] == 1:
                last = r["filled_value"]
            assert r["filled_value"] == last, (u, r)


def test_rollup_cascade_equals_direct_day_aggregation(spark):
    """The minute→hour→day partial-aggregate cascade must equal a
    single direct day-level aggregation (merge laws: counts add,
    decimal sums add, min/max compose)."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.sources.tables import load_table

    Q = entrymod.queries()
    cascade = {
        (r["event_type"], r["day_start"]): r
        for r in Q["events_rollup_cascade"](spark, SF_SMOKE).collect()
    }
    direct = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct(F.date_trunc("minute", "ts")).alias("n_minutes"),
        )
        .collect()
    )
    assert len(direct) == len(cascade)
    for r in direct:
        c = cascade[(r["event_type"], r["day_start"])]
        for col in ("n_events", "sum_value", "min_value", "max_value", "n_minutes"):
            assert c[col] == r[col], (r["event_type"], r["day_start"], col)


def test_seasonal_decompose_residual_is_value_minus_profile(spark):
    """Each anomaly row must satisfy residual == round(value - seasonal)
    and ranks must be 1..3 per event_type with |residual| descending."""
    Q = entrymod.queries()
    rows = Q["events_seasonal_decompose"](spark, SF_SMOKE).collect()
    by_type = defaultdict(list)
    for r in rows:
        assert abs(r["residual"] - round(r["value"] - r["seasonal"], 6)) < 1e-9
        by_type[r["event_type"]].append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        mags = [abs(r["residual"]) for r in rs]
        assert mags == sorted(mags, reverse=True), t


def test_funnel_conversion_time_bounds(spark):
    """min <= median <= max, sum/count consistency, and the converted
    count can't exceed the users who ever viewed."""
    from kinesis_s3_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    [r] = Q["events_funnel_conversion_time"](spark, SF_SMOKE).collect()
    assert r["n_converted"] > 0
    assert 0 < r["min_delay_us"] <= r["median_delay_us"] <= r["max_delay_us"]
    assert r["min_delay_us"] * r["n_converted"] <= r["sum_delay_us"]
    assert r["sum_delay_us"] <= r["max_delay_us"] * r["n_converted"]
    n_viewers = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_converted"] <= n_viewers


def test_drift_ks_bounds_and_recompute(spark):
    """KS stat ∈ [0,1]; recompute D driver-side from raw per-value
    counts (pure python CDF walk) and compare to the engine's."""
    from kinesis_s3_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    [r] = Q["events_drift_ks"](spark, SF_SMOKE).collect()
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["ks_critical"] > 0
    we = (
        F.expr("date_diff(DAY, DATE'1970-01-01', cast(ts as date))") % 7
    ).isin(2, 3)
    counts = (
        load_table(spark, SF_SMOKE, "events")
        .select("value", F.when(we, 1).otherwise(0).alias("we"))
        .groupBy("value")
        .agg(F.sum("we").alias("n1"), F.sum(1 - F.col("we")).alias("n2"))
        .orderBy("value")
        .collect()
    )
    t1 = sum(c["n1"] for c in counts)
    t2 = sum(c["n2"] for c in counts)
    assert (t1, t2) == (r["n_weekend"], r["n_weekday"])
    c1 = c2 = 0
    d = 0.0
    for c in counts:
        c1 += c["n1"]
        c2 += c["n2"]
        d = max(d, round(abs(c1 / t1 - c2 / t2), 6))
    assert abs(d - r["ks_stat"]) < 1e-9
    assert r["drifted"] == (r["ks_stat"] > r["ks_critical"])


def test_peak_detection_rows_are_real_local_maxima(spark):
    """Recompute each peak's neighborhood from the raw hourly rollup:
    every flagged row must be strictly above both hour-neighbors and
    above 1.5x its centered +/-3h mean."""
    from kinesis_s3_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    peaks = Q["events_peak_detection"](spark, SF_SMOKE).collect()
    assert peaks
    hourly = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("v"))
        .collect()
    )
    series = defaultdict(dict)
    for r in hourly:
        series[r["event_type"]][r["h"]] = r["v"]
    for p in peaks:
        s = series[p["event_type"]]
        hs = sorted(s)
        i = hs.index(p["hour_start"])
        assert 0 < i < len(hs) - 1
        assert s[hs[i]] > s[hs[i - 1]] and s[hs[i]] > s[hs[i + 1]]
        lo, hi = max(0, i - 3), min(len(hs), i + 4)
        window = [s[hs[j]] for j in range(lo, hi)]
        local_mean = round(sum(window) / len(window), 6)
        assert s[hs[i]] > 1.5 * local_mean
        assert abs(p["local_mean"] - local_mean) < 1e-6


def test_sequential_patterns_match_bruteforce(spark):
    """Guard for the r12 in-array rewrite: the tagged-stream pair
    mining (first/last (ts, event_id) struct order, pairs generated
    inside the per-session type array) must equal a brute-force
    Python sessionize + ordered-containment count."""
    from kinesis_s3_spark.operators.events import (
        SESSION_GAP_SEC,
        _SEQ_PATTERNS_TOP,
        events_sequential_patterns,
    )
    from kinesis_s3_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    sessions = []
    for rows in by_user.values():
        rows.sort(key=lambda t: (t[0], t[1]))
        cur, prev_ts = [], None
        for ts, eid, et in rows:
            if prev_ts is not None and (ts - prev_ts).total_seconds() > SESSION_GAP_SEC:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_ts = ts
        sessions.append(cur)
    n_total = len(sessions)
    pat = defaultdict(int)
    ante = defaultdict(int)
    for seq in sessions:
        types = set(seq)
        for t in types:
            ante[t] += 1
        first = {t: seq.index(t) for t in types}
        last = {t: len(seq) - 1 - seq[::-1].index(t) for t in types}
        for a in types:
            for b in types:
                if first[a] < last[b]:
                    pat[(a, b)] += 1
    expected = sorted(pat.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    expected = expected[:_SEQ_PATTERNS_TOP]
    got = events_sequential_patterns(spark, SF_CORRECT).collect()
    assert len(got) == len(expected)
    for row, ((a, b), n) in zip(got, expected):
        assert (row["antecedent"], row["consequent"], row["n_sessions"]) == (a, b, n)
        assert row["support"] == round(n / n_total, 6)
        assert row["confidence"] == round(n / ante[a], 6)
