"""Semantic invariants for the event-analytics queries (cohort
retention, transition matrix, per-group mode). Oracle value equality
is covered by tools/check_correctness.py; these pin the properties
that must hold for ANY input."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE


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
