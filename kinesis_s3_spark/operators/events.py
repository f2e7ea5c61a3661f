"""Event-stream operators in batch form: as-of join, gap
sessionization, tumbling/sliding time windows, hourly actives.

The reference has no event-time semantics at all (its batching is
arrival-time only, SURVEY §2 "absent": watermarks/windows/stateful
ops) — these operators are the engine's improvement surface, expressed
so the SAME logic runs in batch (oracle-checked here) and under
Structured Streaming with watermarks (streaming/ tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

SESSION_GAP_SEC = 1800  # 30 min


@query(
    "events_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS u, o_orderdate AS t, MAX(o_orderkey) AS ok
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.ok AS last_orderkey
    FROM events e ASOF LEFT JOIN o ON e.user_id = o.u AND e.ts >= o.t
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest order of that user at or
    before the event time (orders deduped to one per user/date with
    MAX(orderkey) so the match is unambiguous).

    Spark has no ASOF JOIN operator; the scalable encoding is the
    union-and-carry-forward trick: union both streams on (user, time),
    sort within user, carry the last seen orderkey forward with
    last(ignorenulls) — ONE shuffle on user, no range join, no row
    explosion (a naive t1>=t2 join would be O(events × orders) within
    each user and blow up on power users at 100 TB).
    """
    e = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u"), F.col("o_orderdate").alias("t"))
        .agg(F.max("o_orderkey").alias("ok"))
    )
    left = e.select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("ok"),
        F.lit(1).alias("is_event"),
    )
    right = o.select(
        "u", "t", F.lit(None).cast("long").alias("event_id"), "ok", F.lit(0).alias("is_event")
    )
    # at equal timestamps the order sorts first (is_event asc) so an
    # event at exactly t sees that order — the ASOF >= contract
    w = (
        Window.partitionBy("u")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "last_orderkey", F.last("ok", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id", F.col("u").alias("user_id"), "last_orderkey"
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_SEC} * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag → new-session flag → running sum = session id → per-session
    aggregates. One shuffle on user_id; the streaming twin is
    session_window() with a watermark (tests/test_streaming_windows).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe gap: timestamp difference as an interval comparison
    # (no unix_micros — that requires LTZ and would drag the session
    # timezone into the semantics)
    gap = F.col("ts") - F.lag("ts").over(w)
    x = e.withColumn(
        "new_sess",
        F.when(
            gap.isNull() | (gap > F.expr(f"INTERVAL {SESSION_GAP_SEC} SECONDS")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    s = x.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch form of
    window(ts, '1 hour') (streaming twin with watermark in tests)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH expanded AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL (h) HOUR for h in range(0, 3)])
               AS window_start,
             value
      FROM events
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (3 h length, 1 h slide): every event lands in 3
    windows. Spark's window() does the expansion natively; the oracle
    unnests the same 3 bucket starts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "3 hours", "1 hour").getField("start").alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "events_hourly_active",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
           COUNT(*) AS n_events
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def events_hourly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly distinct actives — count-distinct under a time window
    (the approx_count_distinct twin keeps state bounded in streaming).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.countDistinct("user_id").alias("active_users"), F.count("*").alias("n_events")
    )


@query(
    "events_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, event_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS fv
      FROM events
    ),
    s2 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'click' AND fv < ts THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS fc
      FROM s1
    ),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS r_view,
             MAX(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END) AS r_click,
             MAX(CASE WHEN event_type = 'purchase' AND fc < ts THEN 1 ELSE 0 END)
               AS r_purchase
      FROM s2 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(r_view) AS BIGINT) AS n_view,
           CAST(SUM(r_click) AS BIGINT) AS n_click_after_view,
           CAST(SUM(r_purchase) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    increasing event time): how many users reach each step.

    The sequential dependency is encoded as two running-min window
    passes over the SAME (user, time) sort — one shuffle + one sort
    total, then the per-user flags collapse on the already-established
    partitioning. The naive encoding (3 self-joins on user with
    inequality conditions) would be O(events²) within hot users; this
    is linear."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("fv"),
    )
    s2 = s1.withColumn(
        "fc",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("fv") < F.col("ts")), F.col("ts"))
        ).over(w),
    )
    per_user = s2.groupBy("user_id").agg(
        F.max(F.when(F.col("fv").isNotNull(), 1).otherwise(0)).alias("r_view"),
        F.max(F.when(F.col("fc").isNotNull(), 1).otherwise(0)).alias("r_click"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("fc") < F.col("ts")), 1
            ).otherwise(0)
        ).alias("r_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("r_view").cast("long").alias("n_view"),
        F.sum("r_click").cast("long").alias("n_click_after_view"),
        F.sum("r_purchase").cast("long").alias("n_full_funnel"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    c AS (
      SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM d
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           datediff('day', cohort_day, day) AS day_offset,
           COUNT(*) AS n_active
    FROM c GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day
    (cohort), counted on each subsequent active day as an offset from
    the cohort day — the classic product-analytics triangle.

    Plan: dedupe to (user, day) FIRST (map-side combine shrinks the
    shuffle to ≤ users×days rows), then one unbounded window on
    user_id supplies the cohort day without a self-join, then a small
    groupBy on (cohort, offset). Because (user, day) is unique, the
    final COUNT(*) is exactly the distinct-user count — no
    count-distinct Expand needed. Two data shuffles total, both on
    keys that stay uniform at 100 TB (user_id, then a
    bounded-cardinality (cohort, offset) grid)."""
    e = load_table(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    c = d.withColumn("cohort_day", F.min("day").over(Window.partitionBy("user_id")))
    return (
        c.groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
        # date → string for the oracle compare (pandas renders a bare
        # DATE and a midnight TIMESTAMP differently across engines)
        .withColumn("cohort_day", F.date_format("cohort_day", "yyyy-MM-dd"))
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    g AS (
      SELECT event_type AS prev_type, next_type, COUNT(*) AS n
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type)
                 AS DOUBLE), 6) AS p
    FROM g
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (prev_type → next_type) bigrams and normalize
    each row to a transition probability — sequence mining for
    behavioral data, and the bigram primitive a training-data pipeline
    uses for sequence statistics.

    One shuffle on user_id for the LEAD window (ordered by ts with
    event_id as the unique tie-break), then an aggregation that
    collapses to ≤ |types|² rows, so the second window (row
    normalization over prev_type) runs on a trivially small frame.
    Division is exact-int over exact-int in IEEE double — bit-stable
    across engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    g = s.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count("*").cast("long").alias("n"))
    total = F.sum("n").over(Window.partitionBy("prev_type"))
    return g.withColumn(
        "p", F.round(F.col("n").cast("double") / total.cast("double"), 6)
    )


@query(
    "events_zscore_anomaly",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS m,
             CAST(SUM(CAST(n AS DECIMAL(18,6))) AS DOUBLE) AS sn,
             CAST(SUM(CAST(n * n AS DECIMAL(18,6))) AS DOUBLE) AS sn2
      FROM h GROUP BY event_type
    )
    SELECT event_type, hr, n,
           ROUND((n - sn / m) / sqrt(sn2 / m - (sn / m) * (sn / m)), 6) AS z
    FROM h JOIN s USING (event_type)
    WHERE ABS((n - sn / m) / sqrt(sn2 / m - (sn / m) * (sn / m))) > 2
    """,
)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: hourly event counts more than 2
    population standard deviations from their type's mean. Mean and
    variance come from exact decimal power sums (the agg_stats_suite
    pattern), so z is a deterministic function of exact integers —
    sqrt and division are IEEE-exact, no cross-engine drift.

    Plan: one (type, hour) aggregation; the per-type moment aggregate
    collapses to |types| rows and broadcasts back — the detector adds
    no second shuffle over the data. (Spark recomputes the small
    hourly subtree for both sides; at 100 TB persist it or reuse the
    events_hourly_active rollup.)"""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    s = h.groupBy("event_type").agg(
        F.count("*").alias("m"),
        F.sum(F.col("n").cast("decimal(18,6)")).cast("double").alias("sn"),
        F.sum((F.col("n") * F.col("n")).cast("decimal(18,6)")).cast("double").alias("sn2"),
    )
    j = h.join(F.broadcast(s), "event_type")
    mean = F.col("sn") / F.col("m")
    z = (F.col("n") - mean) / F.sqrt(F.col("sn2") / F.col("m") - mean * mean)
    return (
        j.filter(F.abs(z) > 2)
        .select("event_type", "hr", "n", F.round(z, 6).alias("z"))
    )


@query(
    "events_ewma",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, ts,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
             ) AS l
      FROM events
    )
    SELECT event_id, user_id, ts,
           ROUND(list_reduce(l::DOUBLE[], (acc, x) -> (acc + x) * 0.5), 9) AS ewma
    FROM v
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha = 1/2,
    s_1 = x_1, s_t = (s_{t-1} + x_t) / 2) of `value` over the last 8
    events - the smoothing pass behind rate trending and anomaly
    baselines. The fold is one IEEE add + one EXACT halving per step,
    in the same left-to-right order in both engines (Spark F.aggregate
    vs DuckDB list_reduce), so the result is bit-identical across
    engines with no pow(), no decimal detour. Rounded to 9 dp, NOT
    6: value has 2-decimal data and up to 7 exact halvings, so the
    true result terminates at 2+7 = 9 dp - at 9 dp no half-boundary
    can occur and Spark's HALF_UP vs DuckDB's binary rounding agree
    (at 6 dp they demonstrably diverge on ...4375 tails).

    One shuffle (user), one bounded 8-row frame per row; the fold runs
    inside the projection. At 100 TB the frame bound keeps window
    state O(1) per row - no unbounded running state."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-7, Window.currentRow)
    )
    v = e.select(
        "event_id", "user_id", "ts", F.collect_list("value").over(w).alias("l")
    )
    ewma = F.aggregate(
        F.slice(F.col("l"), 2, F.greatest(F.size(F.col("l")) - 1, F.lit(0))),
        F.element_at(F.col("l"), 1),
        lambda acc, x: (acc + x) * F.lit(0.5),
    )
    return v.select("event_id", "user_id", "ts", F.round(ewma, 9).alias("ewma"))


_DRIFT_SQL = """
    WITH lab AS (
      SELECT event_type,
             CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    IN (2, 3) THEN 1 ELSE 0 END AS we
      FROM events
    ),
    per_type AS (
      SELECT event_type,
             CAST(SUM(we) AS BIGINT) AS n_weekend,
             CAST(SUM(1 - we) AS BIGINT) AS n_weekday
      FROM lab GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_weekend) AS DOUBLE) AS t_we,
             CAST(SUM(n_weekday) AS DOUBLE) AS t_wd
      FROM per_type
    ),
    contrib AS (
      SELECT p.event_type, p.n_weekend, p.n_weekday,
             ROUND(
               POW(p.n_weekend - (p.n_weekend + p.n_weekday) * t.t_we / (t.t_we + t.t_wd), 2)
                 / ((p.n_weekend + p.n_weekday) * t.t_we / (t.t_we + t.t_wd))
               + POW(p.n_weekday - (p.n_weekend + p.n_weekday) * t.t_wd / (t.t_we + t.t_wd), 2)
                 / ((p.n_weekend + p.n_weekday) * t.t_wd / (t.t_we + t.t_wd)),
               6) AS chi2_contrib
      FROM per_type p CROSS JOIN tot t
    ),
    total AS (
      SELECT CAST(SUM(CAST(chi2_contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2
      FROM contrib
    )
    SELECT c.event_type, c.n_weekend, c.n_weekday, c.chi2_contrib,
           ROUND(t.chi2, 6) AS chi2_total,
           t.chi2 > 9.488 AS drifted
    FROM contrib c CROSS JOIN total t
"""


@query("events_drift_chi2", oracle=_DRIFT_SQL)
def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square drift test between the weekend and weekday
    event-type mixes (weekend = epoch-day mod 7 in {2, 3}, i.e.
    Sat/Sun — pure integer arithmetic, identical in both engines): the
    standard two-sample categorical drift monitor a pipeline runs to
    catch a source whose event composition shifted. Per-type observed
    counts, chi-square contributions (expected counts from the pooled
    marginals), the corpus-wide statistic, and the df=4 alpha=0.05
    verdict (critical value 9.488).

    Determinism: contributions ROUND 6 then decimal-summed (registry
    rule); counts are exact integers. Plan: one (event_type) count
    aggregate, one 1-row marginal broadcast, row-local contributions,
    one <=|types|-row total broadcast back — the corpus shuffles once
    on event_type."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("date_diff(DAY, DATE'1970-01-01', cast(ts as date))")
    we = (day % 7).isin(2, 3).cast("int")
    per_type = (
        e.select("event_type", we.alias("we"))
        .groupBy("event_type")
        .agg(
            F.sum("we").cast("long").alias("n_weekend"),
            F.sum(1 - F.col("we")).cast("long").alias("n_weekday"),
        )
    )
    tot = per_type.agg(
        F.sum("n_weekend").cast("double").alias("t_we"),
        F.sum("n_weekday").cast("double").alias("t_wd"),
    )
    n_type = F.col("n_weekend") + F.col("n_weekday")
    e_we = n_type * F.col("t_we") / (F.col("t_we") + F.col("t_wd"))
    e_wd = n_type * F.col("t_wd") / (F.col("t_we") + F.col("t_wd"))
    contrib = per_type.join(F.broadcast(tot)).select(
        "event_type",
        "n_weekend",
        "n_weekday",
        F.round(
            F.pow(F.col("n_weekend") - e_we, 2) / e_we
            + F.pow(F.col("n_weekday") - e_wd, 2) / e_wd,
            6,
        ).alias("chi2_contrib"),
    )
    total = contrib.agg(
        F.sum(F.col("chi2_contrib").cast("decimal(18,6)"))
        .cast("double")
        .alias("chi2")
    )
    return contrib.join(F.broadcast(total)).select(
        "event_type",
        "n_weekend",
        "n_weekday",
        "chi2_contrib",
        F.round(F.col("chi2"), 6).alias("chi2_total"),
        (F.col("chi2") > 9.488).alias("drifted"),
    )


_PSI_BINS = 10

_PSI_SQL = f"""
    WITH lab AS (
      SELECT CAST(value AS DOUBLE) AS x,
             CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    IN (2, 3) THEN 1 ELSE 0 END AS we
      FROM events
    ),
    ref AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM lab WHERE we = 0),
    b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((l.x - r.mn) / ((r.mx - r.mn) / {_PSI_BINS}))
                                 AS INT), 0), {_PSI_BINS - 1}) AS bin,
             l.we
      FROM lab l, ref r
    ),
    per_bin AS (
      SELECT bin, CAST(SUM(1 - we) AS BIGINT) AS n_ref, CAST(SUM(we) AS BIGINT) AS n_cur
      FROM b GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref, CAST(SUM(n_cur) AS DOUBLE) AS t_cur
      FROM per_bin
    ),
    contrib AS (
      SELECT p.bin, p.n_ref, p.n_cur,
             ROUND((p.n_ref + 1) / (t.t_ref + {_PSI_BINS}), 6) AS p_ref,
             ROUND((p.n_cur + 1) / (t.t_cur + {_PSI_BINS}), 6) AS p_cur,
             ROUND(((p.n_cur + 1) / (t.t_cur + {_PSI_BINS})
                    - (p.n_ref + 1) / (t.t_ref + {_PSI_BINS}))
                   * LN(((p.n_cur + 1) / (t.t_cur + {_PSI_BINS}))
                        / ((p.n_ref + 1) / (t.t_ref + {_PSI_BINS}))), 6) AS psi_contrib
      FROM per_bin p CROSS JOIN tot t
    ),
    total AS (
      SELECT CAST(SUM(CAST(psi_contrib AS DECIMAL(18,6))) AS DOUBLE) AS psi FROM contrib
    )
    SELECT c.bin, c.n_ref, c.n_cur, c.p_ref, c.p_cur, c.psi_contrib,
           ROUND(t.psi, 6) AS psi_total,
           t.psi > 0.2 AS drifted
    FROM contrib c CROSS JOIN total t
"""


@query("events_drift_psi", oracle=_PSI_SQL)
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor for the NUMERIC
    ``value`` feature — the continuous companion to
    events_drift_chi2's categorical test. Reference population =
    weekday events, current = weekend (same epoch-day labeling as the
    chi2 twin); the feature is cut into 10 equi-width bins over the
    REFERENCE min/max (out-of-range current values clamp into the edge
    bins — the standard fixed-bin PSI), per-bin shares are
    Laplace-smoothed by +1 so empty bins stay finite, and
    PSI = sum((p_cur - p_ref) * ln(p_cur / p_ref)); > 0.2 is the
    conventional 'significant shift' verdict.

    Determinism: bin ids are integer FLOOR arithmetic on doubles
    (identical expressions both engines), contributions ROUND 6 then
    decimal-summed (registry rule).

    Plan/scale: one 1-row reference-range broadcast, one shuffle on
    the 10-key bin column (map-side combined to ≤ 10 partials per
    task), a 1-row totals broadcast, then row-local math on 10 rows —
    the corpus is scanned once, and the monitor's state is 10 counters
    regardless of corpus size (mergeable by addition like every
    fixed-cell sketch here)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("date_diff(DAY, DATE'1970-01-01', cast(ts as date))")
    lab = e.select(
        F.col("value").cast("double").alias("x"),
        (day % 7).isin(2, 3).cast("int").alias("we"),
    )
    ref = lab.filter(F.col("we") == 0).agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / _PSI_BINS
    per_bin = (
        lab.crossJoin(F.broadcast(ref))
        .select(
            F.least(
                F.greatest(
                    F.floor((F.col("x") - F.col("mn")) / width).cast("int"), F.lit(0)
                ),
                F.lit(_PSI_BINS - 1),
            ).alias("bin"),
            "we",
        )
        .groupBy("bin")
        .agg(
            F.sum(1 - F.col("we")).cast("long").alias("n_ref"),
            F.sum("we").cast("long").alias("n_cur"),
        )
    )
    tot = per_bin.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
    )
    p_ref = (F.col("n_ref") + 1) / (F.col("t_ref") + _PSI_BINS)
    p_cur = (F.col("n_cur") + 1) / (F.col("t_cur") + _PSI_BINS)
    contrib = per_bin.join(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_contrib"),
    )
    total = contrib.agg(
        F.sum(F.col("psi_contrib").cast("decimal(18,6)")).cast("double").alias("psi")
    )
    return contrib.join(F.broadcast(total)).select(
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "psi_contrib",
        F.round(F.col("psi"), 6).alias("psi_total"),
        (F.col("psi") > 0.2).alias("drifted"),
    )


@query(
    "events_session_window",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id,
             -- strict >: session_window MERGES an event arriving at
             -- EXACTLY last+gap (pinned by
             -- test_session_window_boundary_is_inclusive)
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_SEC} * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE session_window()
    operator — the built-in twin of events_sessionize's lag+cumsum
    construction, gated against the SAME oracle semantics (a session
    closes after {SESSION_GAP_SEC}s of inactivity). session_window's
    window END is last_event + gap by definition, so the gated
    session_end is the aggregate MAX(ts), identical to the manual
    construction's.

    Why both exist: the manual form works in any engine and proves the
    semantics; this form is the one a Spark user should RUN — it's a
    single groupBy with session-window merging done by the
    UpdatingSessionsExec machinery (no window-function global sort per
    user), and it is the exact expression that becomes a streaming
    stateful session aggregation when fed a readStream (the
    streaming/stateful.py sessionize_stream path is the
    applyInPandasWithState variant of the same contract).

    Scale: one shuffle on user_id; per-user session merging is linear
    in that user's events — no cross-user state, AQE-skew-splittable."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SEC} seconds").alias("w"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


_MAD_SQL = """
    WITH v AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS x FROM events
    ),
    med AS (
      SELECT event_type, x AS med FROM (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
      ) WHERE rk = CAST(CEIL(n / 2.0) AS BIGINT)
    ),
    dev AS (
      SELECT v.event_id, v.event_type, v.x, m.med, ABS(v.x - m.med) AS d
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, d AS mad FROM (
        SELECT event_type, d,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      ) WHERE rk = CAST(CEIL(n / 2.0) AS BIGINT)
    ),
    scored AS (
      SELECT dv.event_id, dv.event_type, dv.x, dv.med, md.mad,
             CASE WHEN md.mad = 0 THEN NULL
                  ELSE ROUND(0.6745 * (dv.x - dv.med) / md.mad, 6) END AS robust_z
      FROM dev dv JOIN mad md USING (event_type)
    )
    SELECT event_id, event_type,
           ROUND(x, 6) AS x, ROUND(med, 6) AS med, ROUND(mad, 6) AS mad, robust_z
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ABS(robust_z) DESC, event_id) AS rk
      FROM scored
    ) WHERE rk <= 5
"""


@query("events_mad_outliers", oracle=_MAD_SQL)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring by median absolute deviation — the
    heavy-tail-safe sibling of events_zscore_anomaly (mean/std break
    down under the very outliers they hunt; median/MAD do not).
    Per event type: lower median by deterministic rank selection
    (rank ceil(n/2), event_id tie-break), MAD the same way over
    absolute deviations, modified z = 0.6745·(x − med)/MAD (Iglewicz &
    Hoaglin), top-5 |z| rows per type reported with their inputs.

    Scale: two rank selections = two window passes partitioned by
    event_type (shuffle on the type key only, WindowGroupLimit caps
    the top-5 read); medians per group are single values joined back
    broadcast-small (|types| rows). On a 100 TB stream the same
    medians would come from sketch_quantile_histogram's mergeable
    bins — this operator is the exact arm, the sketch is the
    production arm."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("x")
    )

    def rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(F.col(col), F.col("event_id"))
        n = Window.partitionBy("event_type")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("n", F.count("*").over(n))
            .filter(F.col("rk") == F.ceil(F.col("n") / 2.0).cast("long"))
            .select("event_type", F.col(col).alias(out))
        )

    med = rank_median(e, "x", "med")
    # localCheckpoint (r12, the join_market_basket finding): dev feeds
    # BOTH the MAD rank-selection (a broadcast subtree) and the scored
    # output side — without materialization the scan → median-window →
    # broadcast-join chain executes once per consumer (plan-verified:
    # two copies). The checkpointed frame is n skinny rows (5 columns).
    dev = (
        e.join(F.broadcast(med), "event_type")
        .withColumn("d", F.abs(F.col("x") - F.col("med")))
        .localCheckpoint()
    )
    mad = rank_median(dev.select("event_type", "event_id", "d"), "d", "mad")
    scored = dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "x",
        "med",
        "mad",
        # mad = 0 (majority value repeats) → undefined score, NULL on
        # both sides: Spark's Divide would NULL while DuckDB yields
        # ±inf, so the guard is what keeps the two engines ranking the
        # same top-5 (ADVICE r5)
        F.when(
            F.col("mad") != 0,
            F.round(0.6745 * (F.col("x") - F.col("med")) / F.col("mad"), 6),
        ).alias("robust_z"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("robust_z")).desc(), F.col("event_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "event_id",
            "event_type",
            F.round("x", 6).alias("x"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "robust_z",
        )
    )


_AR1_SQL = """
    WITH v AS (
      SELECT user_id, CAST(value AS DOUBLE) AS x,
             LAG(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS xp
      FROM events
    ),
    p AS (SELECT user_id, x, xp FROM v WHERE xp IS NOT NULL),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(x * xp AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xp * xp AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(xp AS DECIMAL(38,12))) AS DOUBLE) AS sxp,
             CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sx2
      FROM p GROUP BY user_id
    )
    SELECT user_id, n_pairs,
           CASE WHEN sxx = 0 THEN NULL ELSE ROUND(sxy / sxx, 6) END AS ar1_phi,
           CASE WHEN (n_pairs * sxx - sxp * sxp) * (n_pairs * sx2 - sx * sx) = 0
                THEN NULL
                ELSE ROUND((n_pairs * sxy - sx * sxp)
                           / (sqrt(n_pairs * sxx - sxp * sxp)
                              * sqrt(n_pairs * sx2 - sx * sx)), 6) END AS lag1_autocorr
    FROM s
    ORDER BY user_id
    LIMIT 20
"""


@query("events_ar1_autocorr", oracle=_AR1_SQL)
def events_ar1_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user AR(1) dynamics of the value series: the
    least-squares autoregressive coefficient φ = Σx_t·x_{t-1}/Σx²_{t-1}
    (through-origin fit) and the Pearson lag-1 autocorrelation — the
    two numbers that say whether a user's metric is momentum-driven or
    white noise, feeding the anomaly family (a z-score threshold that
    ignores autocorrelation over-alarms on smooth series). First 20
    users by id (deterministic slice; per-user values are the
    contract).

    Plan/scale: one lag window partitioned by user (shuffle on
    user_id, per-user linear), then a per-user aggregate of five
    decimal sums — map-side combined, no second shuffle since the
    window already co-located the key. 100 TB: identical plan;
    skewed users split by AQE."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = e.select(
        "user_id",
        F.col("value").cast("double").alias("x"),
        F.lag(F.col("value").cast("double")).over(w).alias("xp"),
    ).filter(F.col("xp").isNotNull())
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    s = v.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_pairs"),
        dec(F.col("x") * F.col("xp")).alias("sxy"),
        dec(F.col("xp") * F.col("xp")).alias("sxx"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("xp")).alias("sxp"),
        dec(F.col("x") * F.col("x")).alias("sx2"),
    )
    n = F.col("n_pairs")
    return (
        s.select(
            "user_id",
            "n_pairs",
            # zero-variance guards (ADVICE r5): a constant series makes
            # sxx / the Pearson denominator 0 — Spark's Divide NULLs on
            # /0 while DuckDB IEEE-divides to ±inf, so pin NULL on both
            F.when(
                F.col("sxx") != 0, F.round(F.col("sxy") / F.col("sxx"), 6)
            ).alias("ar1_phi"),
            F.when(
                (n * F.col("sxx") - F.col("sxp") * F.col("sxp"))
                * (n * F.col("sx2") - F.col("sx") * F.col("sx"))
                != 0,
                F.round(
                    (n * F.col("sxy") - F.col("sx") * F.col("sxp"))
                    / (
                        F.sqrt(n * F.col("sxx") - F.col("sxp") * F.col("sxp"))
                        * F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx"))
                    ),
                    6,
                ),
            ).alias("lag1_autocorr"),
        )
        .orderBy("user_id")
        .limit(20)
    )


ASOF_TOLERANCE_DAYS = 9000  # freshness bound; splits the synthetic gap range (8190-9799 d)


@query(
    "events_asof_tolerance",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey AS u, o_orderdate AS t, MAX(o_orderkey) AS ok
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    j AS (
      SELECT e.event_id, e.user_id, e.ts, o.ok, o.t
      FROM events e ASOF LEFT JOIN o ON e.user_id = o.u AND e.ts >= o.t
    )
    SELECT event_id, user_id,
           CASE WHEN date_diff('day', t, ts) <= {ASOF_TOLERANCE_DAYS} THEN ok END
             AS last_orderkey,
           CASE WHEN date_diff('day', t, ts) <= {ASOF_TOLERANCE_DAYS}
                THEN CAST(date_diff('day', t, ts) AS BIGINT) END AS staleness_days
    FROM j
    """,
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance — the feature-store
    contract ("serve the latest feature value, but never one older
    than N days"): same union-and-carry-forward plan as
    events_asof_join, additionally carrying the matched order's OWN
    timestamp forward so the match can be nulled out past the
    {ASOF_TOLERANCE_DAYS}-day bound, with the realized staleness
    reported for audit. Stale features silently served is a classic
    training/serving-skew bug; the tolerance is the guard.

    Scale: identical to events_asof_join (ONE shuffle on user, no
    range join, no row explosion) — the tolerance is a row-local
    post-filter on the carried timestamp, free at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u"), F.col("o_orderdate").alias("t"))
        .agg(F.max("o_orderkey").alias("ok"))
    )
    left = e.select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("ok"),
        F.lit(None).cast("timestamp_ntz").alias("ot"),
        F.lit(1).alias("is_event"),
    )
    right = o.select(
        "u",
        F.col("t").cast("timestamp_ntz").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "ok",
        F.col("t").cast("timestamp_ntz").alias("ot"),
        F.lit(0).alias("is_event"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        left.unionByName(right)
        .withColumn("lk", F.last("ok", ignorenulls=True).over(w))
        .withColumn("lt", F.last("ot", ignorenulls=True).over(w))
    )
    stale = F.expr("timestampdiff(DAY, lt, t)")
    fresh = stale <= ASOF_TOLERANCE_DAYS
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("u").alias("user_id"),
        F.when(fresh, F.col("lk")).alias("last_orderkey"),
        F.when(fresh, stale.cast("long")).alias("staleness_days"),
    )


_CUSUM_W = 64  # trailing-window state bound (the EWMA-frame argument)


_CUSUM_SQL = f"""
    WITH st AS (
      SELECT event_type,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mu,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS q
      FROM events GROUP BY event_type
    ),
    st2 AS (
      SELECT event_type, mu, ROUND(sqrt(q - mu * mu), 6) AS sigma FROM st
    ),
    lw AS (
      SELECT e.event_id, e.event_type, s.mu, s.sigma,
             list(CAST(e.value AS DOUBLE))
               OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                     ROWS {_CUSUM_W - 1} PRECEDING) AS lst
      FROM events e JOIN st2 s USING (event_type)
    ),
    cs AS (
      SELECT event_id, event_type, sigma,
             ROUND(CAST(list_reduce(
               list_prepend(0.0, lst),
               (a, b) -> greatest(a + b - (mu + 0.5 * sigma), 0.0)
             ) AS DOUBLE), 6) AS cusum
      FROM lw
    )
    SELECT event_id, event_type, cusum,
           ROUND(4 * sigma, 6) AS threshold,
           cusum > 4 * sigma AS alarmed
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cusum DESC, event_id) AS rk
      FROM cs
    ) WHERE rk <= 10
"""


@query("events_cusum_alarm", oracle=_CUSUM_SQL)
def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed CUSUM changepoint score per event type (Page 1954):
    s_t = max(0, s_(t-1) + (x_t − μ − 0.5σ)) folded over the trailing
    {_CUSUM_W} values, alarm at 4σ — the sequential mean-shift
    detector that fires on a SUSTAINED small drift the per-point
    z-score (events_zscore_anomaly) and robust-z (events_mad_outliers)
    both miss, completing the anomaly family. The trailing window
    bounds detector state exactly like events_ewma's frame; per type
    the top-10 scores are reported with the threshold verdict.

    Determinism: μ/σ decimal-summed and rounded 6; the fold is the
    same left-to-right IEEE sequence in both engines (Spark
    F.aggregate from a 0 init ≡ DuckDB list_reduce with 0 prepended).

    Scale: one |types|-row moments broadcast, then one
    type-partitioned ordered window carrying a ≤{_CUSUM_W}-element
    frame per row, WindowGroupLimit caps the top-10 read. The fold is
    O(W) per row with W fixed — state never grows with history."""
    e = load_table(spark, sf_dir, "events")
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    x = F.col("value").cast("double")
    st = (
        e.groupBy("event_type")
        .agg(
            F.round(dec(x) / F.count("*"), 6).alias("mu"),
            (dec(x * x) / F.count("*")).alias("q"),
        )
        .select(
            "event_type",
            "mu",
            F.round(F.sqrt(F.col("q") - F.col("mu") * F.col("mu")), 6).alias("sigma"),
        )
    )
    # r12 optimization (guide §4.2): the former shape materialized a
    # ≤64-element collect_list PER ROW (n·W doubles through the window
    # exchange) and folded it with a per-row catalyst higher-order
    # aggregate — n·W greatest-folds, ~8 s at sf1. This kernel computes
    # the identical per-row fold vectorized ACROSS rows: per type
    # (sorted by ts, event_id — the window's order), W sweeps of
    # s = max((s + x_{t-o}) − k, 0) with a ragged-start mask, which
    # replays each row's fold element-for-element in the same IEEE op
    # order ((acc + x) − k, then max; k = mu + 0.5·sigma precomputed
    # with the same two ops). Rounding = trunc(x·1e6 + .5)/1e6, the
    # established DuckDB-ROUND twin. μ/σ stay catalyst decimal sums.
    joined = e.join(F.broadcast(st), "event_type").select(
        "event_id", "event_type", "ts", "mu", "sigma", x.alias("x")
    )
    w_len = _CUSUM_W

    def fold(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        xv = pdf["x"].to_numpy(dtype=np.float64)
        kk = pdf["mu"].to_numpy(dtype=np.float64) + 0.5 * pdf["sigma"].to_numpy(
            dtype=np.float64
        )
        n = len(pdf)
        s = np.zeros(n)
        pos = np.arange(n)
        for o in range(w_len - 1, -1, -1):  # oldest window element first
            idx = pos - o
            valid = idx >= 0
            xs = xv[np.maximum(idx, 0)]
            s = np.where(valid, np.maximum((s + xs) - kk, 0.0), s)
        cus = np.trunc(s * 1e6 + np.copysign(0.5, s)) / 1e6
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "sigma": pdf["sigma"].to_numpy(),
                "cusum": cus,
            }
        )

    cs = joined.groupBy("event_type").applyInPandas(
        fold, "event_id long, event_type string, sigma double, cusum double"
    )
    rw = Window.partitionBy("event_type").orderBy(F.col("cusum").desc(), "event_id")
    return (
        cs.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= 10)
        .select(
            "event_id",
            "event_type",
            "cusum",
            F.round(4 * F.col("sigma"), 6).alias("threshold"),
            (F.col("cusum") > 4 * F.col("sigma")).alias("alarmed"),
        )
    )


@query(
    "events_asof_nearest",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS u, o_orderdate AS t, MAX(o_orderkey) AS ok
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    m AS (
      SELECT user_id AS u, ts AS t, event_id,
             NULL::BIGINT AS ok, 1 AS is_event
      FROM events
      UNION ALL
      SELECT u, t, NULL::BIGINT AS event_id, ok, 0 AS is_event FROM o
    ),
    c AS (
      SELECT *,
             LAST_VALUE(ok IGNORE NULLS) OVER wp AS pk,
             LAST_VALUE(CASE WHEN is_event = 0 THEN t END IGNORE NULLS)
               OVER wp AS pt,
             FIRST_VALUE(ok IGNORE NULLS) OVER wn AS nk,
             FIRST_VALUE(CASE WHEN is_event = 0 THEN t END IGNORE NULLS)
               OVER wn AS nt
      FROM m
      WINDOW
        wp AS (PARTITION BY u ORDER BY t, is_event
               ROWS UNBOUNDED PRECEDING),
        wn AS (PARTITION BY u ORDER BY t, is_event
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, u AS user_id,
           CASE WHEN pk IS NULL AND nk IS NULL THEN NULL
                WHEN pk IS NULL THEN nk
                WHEN nk IS NULL THEN pk
                WHEN date_diff('second', t, nt) < date_diff('second', pt, t)
                  THEN nk
                ELSE pk END AS nearest_orderkey,
           CASE WHEN pk IS NULL AND nk IS NULL THEN NULL
                WHEN pk IS NULL THEN 'next'
                WHEN nk IS NULL THEN 'prev'
                WHEN date_diff('second', t, nt) < date_diff('second', pt, t)
                  THEN 'next'
                ELSE 'prev' END AS direction,
           CASE WHEN pk IS NULL AND nk IS NULL THEN NULL
                WHEN pk IS NULL THEN CAST(date_diff('second', t, nt) AS BIGINT)
                WHEN nk IS NULL THEN CAST(date_diff('second', pt, t) AS BIGINT)
                ELSE CAST(LEAST(date_diff('second', t, nt),
                                date_diff('second', pt, t)) AS BIGINT)
           END AS dist_seconds
    FROM c WHERE is_event = 1
    """,
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join — completes the as-of family
    (backward = events_asof_join, backward-with-tolerance =
    events_asof_tolerance): each event matches the CLOSEST order of
    that user in either time direction, ties to the earlier one, with
    the realized distance and direction reported. The sensor-fusion /
    record-linkage matching mode (align each reading with the nearest
    reference sample, whichever side it falls on).

    Spark-first: the union-and-carry trick run BOTH ways in one
    window-partition pass — carry the last order forward and the
    first order backward over the same (user, time)-sorted merge,
    then a row-local CASE picks the nearer. Still ONE shuffle on
    user, no range join, no row explosion; the same plan at 100 TB
    (AQE splits skewed users)."""
    e = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u"), F.col("o_orderdate").alias("t"))
        .agg(F.max("o_orderkey").alias("ok"))
    )
    left = e.select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("ok"),
        F.lit(None).cast("timestamp_ntz").alias("ot"),
        F.lit(1).alias("is_event"),
    )
    right = o.select(
        "u",
        F.col("t").cast("timestamp_ntz").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "ok",
        F.col("t").cast("timestamp_ntz").alias("ot"),
        F.lit(0).alias("is_event"),
    )
    wp = (
        Window.partitionBy("u")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("u")
        .orderBy("t", "is_event")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        left.unionByName(right)
        .withColumn("pk", F.last("ok", ignorenulls=True).over(wp))
        .withColumn("pt", F.last("ot", ignorenulls=True).over(wp))
        .withColumn("nk", F.first("ok", ignorenulls=True).over(wn))
        .withColumn("nt", F.first("ot", ignorenulls=True).over(wn))
    )
    d_prev = F.expr("timestampdiff(SECOND, pt, t)")
    d_next = F.expr("timestampdiff(SECOND, t, nt)")
    next_wins = d_next < d_prev  # ties -> prev (the earlier order)
    both_null = F.col("pk").isNull() & F.col("nk").isNull()
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("u").alias("user_id"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(F.col("pk").isNull(), F.col("nk"))
        .when(F.col("nk").isNull(), F.col("pk"))
        .when(next_wins, F.col("nk"))
        .otherwise(F.col("pk"))
        .alias("nearest_orderkey"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(F.col("pk").isNull(), F.lit("next"))
        .when(F.col("nk").isNull(), F.lit("prev"))
        .when(next_wins, F.lit("next"))
        .otherwise(F.lit("prev"))
        .alias("direction"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(F.col("pk").isNull(), d_next.cast("long"))
        .when(F.col("nk").isNull(), d_prev.cast("long"))
        .otherwise(F.least(d_next, d_prev).cast("long"))
        .alias("dist_seconds"),
    )


@query(
    "events_pit_features",
    oracle="""
    WITH labels AS (
      SELECT event_id, user_id, ts, value AS label_value
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, ts AS fts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    clicks AS (
      SELECT user_id, ts AS fts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    )
    SELECT l.event_id, l.user_id, l.ts, l.label_value,
           v.value AS last_view_value, c.value AS last_click_value
    FROM labels l
    ASOF LEFT JOIN views v ON l.user_id = v.user_id AND v.fts < l.ts
    ASOF LEFT JOIN clicks c ON l.user_id = c.user_id AND c.fts < l.ts
    """,
)
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature backfill (the feature-store / training-
    set-assembly primitive): for every 'purchase' label, the latest
    'view' and 'click' values STRICTLY before the label's timestamp —
    leakage-safe as-of semantics for N feature families at once.

    The oracle spells it as two ASOF joins; the engine instead makes
    ONE pass: union the label and feature rows, shuffle once by
    user_id, and carry each family as a last(ignorenulls) running
    column down the per-user timeline. At equal timestamps labels sort
    BEFORE features (strict <), and features tie-break by event_id so
    "latest" is total. Scale: adding a feature family adds a column,
    not a join — N families still cost one shuffle + one sort, vs N
    sort-merge joins for the ASOF formulation.
    """
    e = load_table(spark, sf_dir, "events")
    rows = e.filter(F.col("event_type").isin("purchase", "view", "click")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_label"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("label_value"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("vf"),
        F.when(F.col("event_type") == "click", F.col("value")).alias("cf"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_label").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.select(
            "event_id",
            "user_id",
            "ts",
            "is_label",
            "label_value",
            F.last("vf", ignorenulls=True).over(w).alias("last_view_value"),
            F.last("cf", ignorenulls=True).over(w).alias("last_click_value"),
        )
        .filter(F.col("is_label") == 1)
        .select(
            "event_id", "user_id", "ts", "label_value",
            "last_view_value", "last_click_value",
        )
    )


@query(
    "events_streak_runs",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, event_type,
             CASE WHEN prev_type IS NULL OR prev_type != event_type
                  THEN 1 ELSE 0 END AS new_run,
             ts, event_id
      FROM o
    ),
    runs AS (
      SELECT user_id, event_type,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ),
    lens AS (
      SELECT user_id, event_type, run_id, CAST(COUNT(*) AS BIGINT) AS len
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS max_len,
           ROUND(CAST(SUM(len) AS DOUBLE) / COUNT(*), 6) AS avg_len
    FROM lens GROUP BY event_type
    """,
)
def events_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive same-type runs per user timeline
    (the streak/retention primitive — sessionization's sibling keyed
    on VALUE change instead of time gap). lag→change-flag→running-sum
    assigns run ids in one window pass; runs then aggregate by type.

    Scale: both window passes ride the SAME (user_id, ts) shuffle and
    sort — Catalyst plans one exchange; run lengths aggregate map-side.
    State per row is one lag value, never the history.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_run")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    lens = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count("*").cast("long").alias("len")
    )
    return lens.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.max("len").cast("long").alias("max_len"),
        F.round(F.sum("len").cast("double") / F.count("*"), 6).alias("avg_len"),
    )


_MARKOV_ROUNDS = 8

_MARKOV_ROUND_SQL = """
    r{k} AS (
      SELECT t.event_type AS s,
             COALESCE(m.pv, 0.0) AS pv
      FROM types t LEFT JOIN (
        SELECT p.j AS s,
               ROUND(CAST(SUM(CAST(r.pv * p.p AS DECIMAL(38,12))) AS DOUBLE), 6) AS pv
        FROM P p JOIN r{km1} r ON p.i = r.s
        GROUP BY p.j
      ) m ON m.s = t.event_type
    )"""

_MARKOV_SQL = (
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM o WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    ),
    tot AS (SELECT i, CAST(SUM(cnt) AS BIGINT) AS t FROM pairs GROUP BY i),
    P AS (
      SELECT pairs.i, pairs.j, CAST(cnt AS DOUBLE) / t AS p
      FROM pairs JOIN tot USING (i)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    r0 AS (
      SELECT event_type AS s,
             1.0 / (SELECT COUNT(*) FROM types) AS pv
      FROM types
    ),"""
    + ",".join(
        _MARKOV_ROUND_SQL.format(k=k, km1=k - 1) for k in range(1, _MARKOV_ROUNDS + 1)
    )
    + f"""
    , nrm AS (
      SELECT CAST(SUM(CAST(pv AS DECIMAL(38,12))) AS DOUBLE) AS z
      FROM r{_MARKOV_ROUNDS}
    )
    SELECT a.s AS event_type,
           ROUND(a.pv / nrm.z, 6) AS pi,
           ROUND(ABS(a.pv - b.pv), 6) AS resid
    FROM r{_MARKOV_ROUNDS} a
    JOIN r{_MARKOV_ROUNDS - 1} b ON a.s = b.s
    CROSS JOIN nrm
    """
)


@query("events_markov_stationary", oracle=_MARKOV_SQL)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain: the
    transition matrix P (events_transition_matrix's kernel) powered to
    convergence by 8 rounds of pi' = pi.P from uniform
    — the long-run share of attention each event type commands, with
    the last-round residual as the convergence audit (PageRank's
    special case on the |types|-node chain).

    Scale split is the whole point: counting P is the data-sized job
    (ONE lag-window pass + one (i,j) aggregate); P itself is BOUNDED
    by construction (|types|^2 rows), so it is collected once — the
    k-means-centroid / PQ-codebook pattern — and the 8 rounds become a
    pure expression tree over those literals that Catalyst constant-
    folds: zero additional jobs, vs ~0.5 s of fixed stage-scheduling
    cost per round when each round was its own tiny shuffle.
    Determinism: the arithmetic stays ENGINE-side (per-round decimal
    dot products + ROUND 6, the emb_power_iteration recipe), never
    Python floats.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = o.groupBy(
        F.col("prev_type").alias("i"), F.col("event_type").alias("j")
    ).agg(F.count("*").cast("long").alias("cnt"))
    tot = pairs.groupBy("i").agg(F.sum("cnt").cast("long").alias("t"))
    # P is the one driver-sized collect (bounded |types|^2 rows); the
    # type-universe scan is an INDEPENDENT job over the same table, so
    # the two collects run from a 2-thread pool (guide §2.6) — the
    # distinct scan back-fills executors idled by the window job's
    # tail instead of paying its wall time serially. Type universe
    # from the TABLE, not from P's keys: a type that never appears
    # adjacent to another event must still get 1/|types| initial mass
    # (matches the oracle's SELECT DISTINCT event_type).
    from concurrent.futures import ThreadPoolExecutor

    p_frame = pairs.join(tot, "i").select(
        "i", "j", (F.col("cnt").cast("double") / F.col("t")).alias("p")
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        p_rows_f = pool.submit(p_frame.collect)
        t_rows_f = pool.submit(e.select("event_type").distinct().collect)
        P = {(r["i"], r["j"]): r["p"] for r in p_rows_f.result()}
        tnames = sorted(r["event_type"] for r in t_rows_f.result())
    dec = "decimal(38,12)"
    one = spark.range(1)

    def _dot(pi_vals: dict, j: str):
        terms = [
            (F.lit(pi_vals[i]) * F.lit(P[(i, j)])).cast(dec)
            for i in tnames
            if (i, j) in P
        ]
        if not terms:
            return F.lit(0.0)
        acc = terms[0]
        for term in terms[1:]:
            # re-cast per step: Spark widens decimal + to (38,11)
            acc = (acc + term).cast(dec)
        return F.round(acc.cast("double"), 6)

    def _dot_expr(pi_exprs: dict, j: str):
        # same fold, but over COLUMN expressions (for the second round
        # inside one job — tree grows |types|x per nested round, so
        # only pairs are nested; full 8-round unrolling is 5^8 nodes)
        terms = [
            (pi_exprs[i] * F.lit(P[(i, j)])).cast(dec)
            for i in tnames
            if (i, j) in P
        ]
        if not terms:
            return F.lit(0.0)
        acc = terms[0]
        for term in terms[1:]:
            acc = (acc + term).cast(dec)
        return F.round(acc.cast("double"), 6)

    pi_vals = {t: 1.0 / len(tnames) for t in tnames}
    prev_vals = pi_vals
    assert _MARKOV_ROUNDS % 2 == 0
    for _ in range(_MARKOV_ROUNDS // 2):
        # engine-side rounds: one 1-row job computes TWO pi.P steps
        # (the mid-round as a nested expression, its result re-derived
        # for the resid audit); values re-enter as exact double
        # literals — quality_lr's GD-step pattern. A lazily chained
        # DataFrame version pays ~0.5 s/round in stage scheduling.
        mid = {j: _dot(pi_vals, j) for j in tnames}
        row = one.select(
            *[mid[j].alias(f"m_{j}") for j in tnames],
            *[_dot_expr(mid, j).alias(j) for j in tnames],
        ).collect()[0]
        prev_vals = {t: row[f"m_{t}"] for t in tnames}
        pi_vals = {t: row[t] for t in tnames}
    zcol = None
    for t in tnames:
        zt = F.lit(pi_vals[t]).cast(dec)
        zcol = zt if zcol is None else (zcol + zt).cast(dec)
    z_dbl = zcol.cast("double")
    types = spark.createDataFrame([(t,) for t in tnames], "event_type string")
    pi_col = None
    resid_col = None
    for t in tnames:
        c = F.col("event_type") == t
        pr = F.round(F.lit(pi_vals[t]) / z_dbl, 6)
        rs = F.round(F.abs(F.lit(pi_vals[t]) - F.lit(prev_vals[t])), 6)
        pi_col = F.when(c, pr) if pi_col is None else pi_col.when(c, pr)
        resid_col = F.when(c, rs) if resid_col is None else resid_col.when(c, rs)
    return types.select("event_type", pi_col.alias("pi"), resid_col.alias("resid"))


# One SQL text, two engines: everything in the recursive-session query
# is dialect-shared (window row_number, self-join edges, WITH RECURSIVE
# UNION ALL, interval comparison), so the oracle IS the Spark query.
_RECURSIVE_SESSIONS_SQL = f"""
    WITH RECURSIVE o AS (
      SELECT user_id, ts, event_id,
             ROW_NUMBER() OVER w AS rn,
             LAG(ts) OVER w AS prev_ts,
             LEAD(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    e AS (
      SELECT user_id, rn AS src, rn + 1 AS dst
      FROM o
      WHERE next_ts IS NOT NULL
        AND next_ts - ts <= INTERVAL '{SESSION_GAP_SEC}' SECOND
    ),
    starts AS (
      SELECT user_id, rn
      FROM o
      WHERE prev_ts IS NULL
         OR ts - prev_ts > INTERVAL '{SESSION_GAP_SEC}' SECOND
    ),
    walk AS (
      SELECT user_id, rn AS start_rn, rn AS cur_rn, 1 AS len FROM starts
      UNION ALL
      SELECT w.user_id, w.start_rn, e.dst, w.len + 1
      FROM walk w JOIN e
        ON e.user_id = w.user_id AND e.src = w.cur_rn
    ),
    sess AS (
      SELECT user_id, start_rn, CAST(MAX(len) AS BIGINT) AS session_len
      FROM walk GROUP BY user_id, start_rn
    )
    SELECT session_len, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM sess GROUP BY session_len
"""

@query("events_recursive_sessions", oracle=_RECURSIVE_SESSIONS_SQL)
def events_recursive_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution by RECURSIVE traversal (Spark 4's
    WITH RECURSIVE): anchor = events with no qualifying predecessor
    (session starts), step = follow the next-event edge while the gap
    stays inside the 1800 s budget — the BFS formulation of exactly
    what events_sessionize computes with lag+cumsum windows (the
    pytest gates the two distributions equal).

    Scale: recursion costs one frontier shuffle join PER DEPTH level
    (measured: 4.5 s at sf0.1 where max depth is 4; ~55 s at the 10x
    corpus where sessions grow ~10x longer — while the window twin
    stays sub-second). The recipe is therefore: windows when the
    dependency is expressible as a frame (sessions are), recursion
    only for genuine hierarchy/reachability (BOM explosion, referral
    chains) where depth is small and no frame exists; value-monotone
    propagation over cyclic graphs is the label-propagation loop
    (dedup_cluster_resolve).
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # the walk materializes one row per (event, step) — sum of session
    # lengths — which exceeds Spark's default 1M recursion-row cap at
    # the 10x corpus; the cap is a runaway guard, not a plan knob, so
    # raise it only for this query and restore the session default after
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
    try:
        # conf is read at EXECUTION, not plan time — materialize the
        # (session-sized, bounded) result while the raise is in effect
        return spark.sql(_RECURSIVE_SESSIONS_SQL).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prev)


@query(
    "events_resample_ffill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_start,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS obs_value
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    span AS (
      SELECT user_id, MIN(hour_start) AS h0, MAX(hour_start) AS h1
      FROM hourly GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
      FROM span
    )
    SELECT s.user_id, s.hour_start,
           CASE WHEN h.obs_value IS NULL THEN 0 ELSE 1 END AS is_observed,
           LAST_VALUE(h.obs_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.hour_start
             ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM spine s LEFT JOIN hourly h USING (user_id, hour_start)
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: regularize each user's
    hourly value series onto a gap-free hour spine (their first to last
    active hour), carrying the last observed hour-sum across gaps —
    the standard "make irregular events a regular feature series" prep
    for forecasting / training windows (the hypertable `time_bucket
    gapfill + locf` shape; reference has no event-time ops, SURVEY §2).

    Spark-first: the spine is generated IN-ENGINE with
    sequence(min,max,interval)+explode — no driver loop, no range
    table; rows are bounded by Σ_user span-hours. All three stages
    (hourly agg, span agg, ffill window) hash/sort on user_id, so AQE
    plans one user-keyed exchange lineage; the forward fill is
    last(ignorenulls) over a user-partitioned window — never a global
    sort. At 100 TB the spine explode is map-side from one tiny span
    row per user.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("obs_value")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_start"
            ),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour_start"], "left")
        .withColumn(
            "is_observed",
            F.when(F.col("obs_value").isNull(), F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn("filled_value", F.last("obs_value", ignorenulls=True).over(w))
        .select("user_id", "hour_start", "is_observed", "filled_value")
    )


@query(
    "events_rollup_cascade",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(COUNT(DISTINCT date_trunc('minute', ts)) AS BIGINT) AS n_minutes
    FROM events GROUP BY event_type, date_trunc('day', ts)
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: raw events →
    1-minute rollup → hourly rollup (merging minute partials) → daily
    rollup (merging hourly partials). The oracle aggregates the day
    level DIRECTLY from raw events, so the gate proves the partial-
    aggregate merge laws hold exactly through two re-aggregations:
    counts add, DECIMAL sums add (order-free — the reason sums stay
    DECIMAL(18,6) until the final cast), min/max compose, and
    distinct-minute counts emerge as COUNT(minute rows) at the hour
    level then SUM upward.

    Scale: this is the TimescaleDB/Druid rollup contract — the daily
    query never rescans raw data. Only the minute rollup touches the
    full corpus (one shuffle, partial map-side aggregation); hour and
    day re-aggregate frames that are ~1440× and ~24× smaller. An
    incremental refresh maintains the minute level only for new
    partitions (the etl_incremental_agg_merge / streaming/mv.py arm
    proves delta⊕state==recompute for the same merge laws).
    """
    e = load_table(spark, sf_dir, "events")
    minute = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    hour = minute.groupBy(
        "event_type", F.date_trunc("hour", "minute_start").alias("hour_start")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sv").alias("sv"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.count("*").alias("n_minutes"),
    )
    return (
        hour.groupBy("event_type", F.date_trunc("day", "hour_start").alias("day_start"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            F.sum("n_minutes").alias("n_minutes"),
        )
        .select(
            "event_type",
            "day_start",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
            "n_minutes",
        )
    )


@query(
    "events_seasonal_decompose",
    oracle="""
    WITH prof AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hod,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS seasonal
      FROM events GROUP BY event_type, hour(ts)
    ),
    resid AS (
      SELECT e.event_type, e.event_id, p.hod, e.value, p.seasonal,
             ROUND(e.value - p.seasonal, 6) AS residual
      FROM events e JOIN prof p
        ON e.event_type = p.event_type AND CAST(hour(e.ts) AS INT) = p.hod
    )
    SELECT event_type, event_id, hod, value, seasonal, residual, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ABS(residual) DESC, event_id) AS rank
      FROM resid
    ) WHERE rank <= 3
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, the classifier-free anomaly detector:
    per (event_type, hour-of-day) seasonal baseline (decimal mean,
    rounded before subtraction), residual = value − seasonal, top-3
    largest |residual| anomalies per type. Complements the global
    z-score (events_zscore_anomaly) and MAD detectors: an event that
    is normal at 14:00 but extreme at 03:00 only shows up against the
    diurnal profile.

    Scale: the profile frame is bounded (|types| × 24 rows) so the
    join back is a broadcast; one data-sized aggregation builds it
    (map-side combined), and the per-type top-3 window runs under
    WindowGroupLimit (per-task heaps, never a full sort). At 100 TB
    this is one scan + one broadcast join + one heap pass — the same
    shape a streaming scorer would run with the profile as a
    foreachBatch-refreshed dim.
    """
    e = load_table(spark, sf_dir, "events")
    prof = (
        e.groupBy("event_type", F.hour("ts").cast("int").alias("hod"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("seasonal")
        )
    )
    resid = (
        e.withColumn("hod", F.hour("ts").cast("int"))
        .join(F.broadcast(prof), ["event_type", "hod"])
        .withColumn("residual", F.round(F.col("value") - F.col("seasonal"), 6))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("residual")).desc(), F.col("event_id")
    )
    return (
        resid.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "event_id", "hod", "value", "seasonal", "residual", "rank")
    )


@query(
    "events_funnel_conversion_time",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
      GROUP BY e.user_id
    ),
    d AS (
      SELECT CAST(epoch_us(fp.first_purchase) - epoch_us(fv.first_view) AS BIGINT)
               AS delay_us
      FROM fv JOIN fp USING (user_id)
    )
    SELECT COUNT(*) AS n_converted,
           CAST(MIN(delay_us) AS BIGINT) AS min_delay_us,
           CAST(MAX(delay_us) AS BIGINT) AS max_delay_us,
           CAST(SUM(delay_us) AS BIGINT) AS sum_delay_us,
           ROUND(CAST(MEDIAN(delay_us) AS DOUBLE), 1) AS median_delay_us
    FROM d
    """,
)
def events_funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user, the delay between
    their FIRST view and their first purchase strictly after it, then
    the count / min / max / sum / exact median of those delays — the
    metric that turns events_funnel_steps' "how many converted" into
    "how fast", which is what conversion SLAs and cohort comparisons
    actually chart.

    Scale: two user-keyed aggregations and one user-keyed join (all
    co-partitioned — AQE reuses one exchange lineage), then a 1-row
    final aggregate. Delays are integer microseconds (exact); the
    exact median over per-user delays is bounded by |converting
    users|, and at extreme scale swaps for the histogram-quantile
    sketch (sketch_quantile_histogram) without changing the contract.
    """
    e = load_table(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    d = fv.join(fp, "user_id").select(
        F.expr("timestampdiff(MICROSECOND, first_view, first_purchase)")
        .cast("long")
        .alias("delay_us")
    )
    return d.agg(
        F.count("*").alias("n_converted"),
        F.min("delay_us").cast("long").alias("min_delay_us"),
        F.max("delay_us").cast("long").alias("max_delay_us"),
        F.sum("delay_us").cast("long").alias("sum_delay_us"),
        F.round(F.median("delay_us"), 1).alias("median_delay_us"),
    )


# Kolmogorov-Smirnov critical coefficient at alpha = 0.05 (two-sample):
# D_crit = 1.358 * sqrt((n1 + n2) / (n1 * n2)).
_KS_C_ALPHA = 1.358


@query(
    "events_drift_ks",
    oracle=f"""
    WITH lab AS (
      SELECT value,
             CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    IN (2, 3) THEN 1 ELSE 0 END AS we
      FROM events
    ),
    counts AS (
      SELECT value,
             CAST(SUM(we) AS BIGINT) AS n1,
             CAST(SUM(1 - we) AS BIGINT) AS n2
      FROM lab GROUP BY value
    ),
    cum AS (
      SELECT value,
             SUM(n1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1,
             SUM(n2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c2
      FROM counts
    ),
    tot AS (
      SELECT CAST(SUM(n1) AS DOUBLE) AS t1, CAST(SUM(n2) AS DOUBLE) AS t2
      FROM counts
    ),
    d AS (
      SELECT MAX(ROUND(ABS(c.c1 / t.t1 - c.c2 / t.t2), 6)) AS ks_stat,
             CAST(COUNT(*) AS BIGINT) AS n_values
      FROM cum c CROSS JOIN tot t
    )
    SELECT d.n_values,
           CAST(t.t1 AS BIGINT) AS n_weekend,
           CAST(t.t2 AS BIGINT) AS n_weekday,
           d.ks_stat,
           ROUND({_KS_C_ALPHA} * SQRT((t.t1 + t.t2) / (t.t1 * t.t2)), 6)
             AS ks_critical,
           d.ks_stat > ROUND({_KS_C_ALPHA} * SQRT((t.t1 + t.t2) / (t.t1 * t.t2)), 6)
             AS drifted
    FROM d CROSS JOIN tot t
    """,
)
def events_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the value
    distribution, weekend vs weekday (same TZ-free day split as the
    chi-square twin): D = max over v of |F_we(v) − F_wd(v)| against
    the alpha=0.05 critical line. KS sees SHAPE drift (variance,
    skew, bimodality) that the binned PSI smooths over and the
    categorical chi-square can't express — the third leg of the drift
    suite.

    Spark-first scale story: the empirical CDFs need a GLOBAL
    cumulative over the distinct-value frame — the exact shape the
    two-phase prefix-sum primitive (operators/ranking.py
    global_prefix_sum) exists for, used here for both group CDFs
    chained over one bucketize each; no single-partition window
    anywhere (plan-audited class, budget 0). The data-sized work is
    one groupBy(value) with map-side combine; everything after is
    |distinct values|-bound. The oracle can afford a plain window —
    it is DuckDB.
    """
    from kinesis_s3_spark.operators.ranking import global_prefix_sum

    e = load_table(spark, sf_dir, "events")
    we = (
        F.expr("date_diff(DAY, DATE'1970-01-01', cast(ts as date))") % 7
    ).isin(2, 3)
    counts = (
        e.select("value", F.when(we, 1).otherwise(0).alias("we"))
        .groupBy("value")
        .agg(
            F.sum("we").cast("long").alias("n1"),
            F.sum(1 - F.col("we")).cast("long").alias("n2"),
        )
        # |distinct values|-bound; feeds five branches (bucketize
        # bounds, the ranked pass, both offset joins, the totals) —
        # materialize once instead of re-aggregating the corpus per
        # branch
        .localCheckpoint()
    )
    # INCLUSIVE cumulative = exclusive prefix sum + own count; both
    # CDFs in ONE two-phase pass (shared bucketize/shuffle/offsets)
    cum = global_prefix_sum(
        counts, F.col("value"), [F.col("value")], ["n1", "n2"], ["p1", "p2"]
    )
    cum = cum.select(
        "value",
        (F.col("p1") + F.col("n1")).alias("c1"),
        (F.col("p2") + F.col("n2")).alias("c2"),
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("n1").cast("double").alias("t1"),
            F.sum("n2").cast("double").alias("t2"),
        )
    )
    d = (
        cum.crossJoin(tot)
        .agg(
            F.max(
                F.round(F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2")), 6)
            ).alias("ks_stat"),
            F.count("*").cast("long").alias("n_values"),
        )
    )
    crit = F.round(
        _KS_C_ALPHA * F.sqrt((F.col("t1") + F.col("t2")) / (F.col("t1") * F.col("t2"))),
        6,
    )
    return (
        d.crossJoin(tot)
        .select(
            "n_values",
            F.col("t1").cast("long").alias("n_weekend"),
            F.col("t2").cast("long").alias("n_weekday"),
            "ks_stat",
            crit.alias("ks_critical"),
            (F.col("ks_stat") > crit).alias("drifted"),
        )
    )


# Peak criteria: strictly above both neighbors AND above the centered
# ±3 h local mean by the factor below — the "alert on a spike, not on
# a plateau" shape of metric monitoring.
_PEAK_FACTOR = 1.5


@query(
    "events_peak_detection",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_start,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    ctx AS (
      SELECT event_type, hour_start, v,
             LAG(v) OVER w AS prev, LEAD(v) OVER w AS next,
             ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER (
                     PARTITION BY event_type ORDER BY hour_start
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
                   / COUNT(*) OVER (
                     PARTITION BY event_type ORDER BY hour_start
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
               AS local_mean
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_start)
    )
    SELECT event_type, hour_start, v, local_mean,
           ROUND(v / local_mean, 4) AS ratio
    FROM ctx
    WHERE prev IS NOT NULL AND next IS NOT NULL
      AND v > prev AND v > next AND v > {_PEAK_FACTOR} * local_mean
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike (peak) detection on the hourly value series per event
    type: a peak is strictly above BOTH neighbors and above
    {factor}× the centered ±3 h local mean — the standard "alert on a
    spike, not a plateau or a level shift" monitor, complementing the
    sustained-shift CUSUM and the distributional KS/PSI detectors.
    Series endpoints can't qualify (no neighbor).

    Scale: one data-sized hourly rollup (map-side combined), then
    lag/lead/rolling-mean all over ONE (event_type, hour) window
    partitioning — a single exchange of \\|types × hours\\| rollup
    rows, never raw events. Hour sums and the local mean go through
    DECIMAL (order-free) and are rounded before every comparison, so
    the peak verdicts are bit-stable across engines and partitionings.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("hour_start")
    roll = w.rowsBetween(-3, 3)
    ctx = (
        hourly.withColumn("prev", F.lag("v").over(w))
        .withColumn("next", F.lead("v").over(w))
        .withColumn(
            "local_mean",
            F.round(
                F.sum(F.col("v").cast("decimal(18,6)")).over(roll).cast("double")
                / F.count("*").over(roll),
                6,
            ),
        )
    )
    return (
        ctx.filter(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("v") > F.col("prev"))
            & (F.col("v") > F.col("next"))
            & (F.col("v") > _PEAK_FACTOR * F.col("local_mean"))
        )
        .select(
            "event_type",
            "hour_start",
            "v",
            "local_mean",
            F.round(F.col("v") / F.col("local_mean"), 4).alias("ratio"),
        )
    )


@query(
    "events_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bar_start,
             value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS volume,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM r GROUP BY event_type, bar_start
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling (candlesticks): per (event_type, hour),
    the first/highest/lowest/last value plus volume and a decimal-exact
    sum — the canonical time-series compaction every metrics/market
    pipeline runs before charting or modeling.

    Spark-first plan: ONE hash aggregation — open/close come from
    ``min_by``/``max_by`` over the (ts, event_id) struct (struct
    ordering = lexicographic, so the tie-break is the same total order
    the oracle's window uses), not from a window — so the whole bar
    table costs a single map-side-combined shuffle keyed by
    (type, hour); no sort, no second pass. The DuckDB oracle can
    afford the two-window formulation. At 100 TB the group count is
    |types| x hours (bounded), so partial aggregation collapses
    almost everything map-side; this is the rollup-first doctrine
    (events_rollup_cascade) applied to the OHLC shape."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            "event_type",
            F.window("ts", "1 hour").getField("start").alias("bar_start"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("volume"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


_ATTRIBUTION_SQL = r"""
    WITH marked AS (
      SELECT event_id, ts, user_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
      SELECT CASE WHEN touch_ts IS NULL
                    OR epoch_us(ts) - epoch_us(touch_ts)
                       > 7 * 86400 * 1000000::BIGINT
                  THEN 'direct' ELSE touch_type END AS channel,
             value,
             CASE WHEN touch_ts IS NULL
                    OR epoch_us(ts) - epoch_us(touch_ts)
                       > 7 * 86400 * 1000000::BIGINT
                  THEN NULL
                  ELSE epoch_us(ts) - epoch_us(touch_ts) END AS delay_us
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT channel,
           COUNT(*) AS n_conversions,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value,
           CAST(SUM(delay_us) AS BIGINT) AS sum_delay_us,
           ROUND(CAST(SUM(delay_us) AS DOUBLE) / COUNT(delay_us), 1) AS avg_delay_us
    FROM conv GROUP BY channel
"""

_ATTR_LOOKBACK_US = 7 * 86400 * 1_000_000  # 7-day lookback window


@query("events_attribution", oracle=_ATTRIBUTION_SQL)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent PRECEDING non-purchase event ("touch")
    within a 7-day lookback; purchases with no in-window touch are
    'direct'. Per channel: conversions, attributed revenue, and the
    total/average click-to-convert delay — the report every
    campaign-ROI dashboard runs.

    Plan: ONE window pass per user (carry the last non-purchase
    (type, ts) forward with last(..., ignorenulls) over an
    unbounded-preceding/1-preceding frame — the streaming twin is a
    keyed state cell), then a |channels|-row hash aggregate. One
    user-keyed shuffle total; no self-join of the event table, which
    is how attribution is usually (quadratically) written. Delays are
    exact integer microseconds; revenue sums through DECIMAL(18,6)
    (registry determinism rules).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    marked = (
        e.withColumn(
            "touch_type",
            F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True).over(w),
        )
        .withColumn(
            "touch_ts",
            F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True).over(w),
        )
        .where(F.col("event_type") == "purchase")
    )
    delay = F.expr("timestampdiff(MICROSECOND, touch_ts, ts)").cast("long")
    expired = F.col("touch_ts").isNull() | (delay > F.lit(_ATTR_LOOKBACK_US))
    conv = marked.select(
        F.when(expired, F.lit("direct")).otherwise(F.col("touch_type")).alias("channel"),
        "value",
        F.when(expired, F.lit(None).cast("long")).otherwise(delay).alias("delay_us"),
    )
    return conv.groupBy("channel").agg(
        F.count("*").alias("n_conversions"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("attributed_value"),
        F.sum("delay_us").cast("long").alias("sum_delay_us"),
        F.round(F.sum("delay_us").cast("double") / F.count("delay_us"), 1).alias(
            "avg_delay_us"
        ),
    )


_RFM_SQL = r"""
    WITH mx AS (SELECT MAX(ts) AS mt FROM events),
    u AS (
      SELECT user_id,
             (epoch_us((SELECT mt FROM mx)) - epoch_us(MAX(ts))) // 86400000000
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    ),
    n AS (SELECT COUNT(*) AS nu FROM u),
    r AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY recency_days, user_id) AS rn
          FROM u),
    f AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY frequency DESC, user_id) AS rn
          FROM u),
    m AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY monetary DESC, user_id) AS rn
          FROM u)
    SELECT u.user_id,
           CAST(u.recency_days AS BIGINT) AS recency_days,
           u.frequency, u.monetary,
           CAST(1 + (5 * (r.rn - 1)) // n.nu AS BIGINT) AS r_score,
           CAST(1 + (5 * (f.rn - 1)) // n.nu AS BIGINT) AS f_score,
           CAST(1 + (5 * (m.rn - 1)) // n.nu AS BIGINT) AS m_score,
           'R' || CAST(1 + (5 * (r.rn - 1)) // n.nu AS VARCHAR) ||
           'F' || CAST(1 + (5 * (f.rn - 1)) // n.nu AS VARCHAR) ||
           'M' || CAST(1 + (5 * (m.rn - 1)) // n.nu AS VARCHAR) AS segment
    FROM u JOIN r USING (user_id) JOIN f USING (user_id) JOIN m USING (user_id), n
"""


@query("events_rfm_segments", oracle=_RFM_SQL)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic CRM cohorting: per user, whole days since their last
    event (vs the corpus max), event count, and exact-decimal value
    sum; each metric then gets a 1..5 quintile score from its GLOBAL
    rank (score 1 = most recent / most frequent / highest value), and
    the three concatenate into the familiar 'R1F2M3' segment.

    Plan: one user-keyed hash aggregate builds the metric frame; the
    three global ranks run on the distributed two-phase primitive —
    recency and frequency are LOW-CARDINALITY keys (days-since and
    Zipfian counts: the exact tie-degenerate shapes VERDICT r7 found),
    so they go through global_row_number_tiesafe with user_id
    sub-bucketing; monetary is a high-cardinality double, so the
    single-level form suffices. No single-partition window anywhere;
    the quintile arithmetic is integer floor-division against a 1-row
    broadcast user count, identical in both engines.
    """
    from kinesis_s3_spark.operators.ranking import (
        global_row_number,
        global_row_number_tiesafe,
    )

    e = load_table(spark, sf_dir, "events")
    mx = F.broadcast(e.agg(F.max("ts").alias("mt")))
    u = (
        e.crossJoin(mx)
        .groupBy("user_id")
        .agg(
            # integer div (not /86.4e9 + cast): exact past 2^53 µs
            F.expr(
                "timestampdiff(MICROSECOND, max(ts), any_value(mt)) div 86400000000"
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("monetary"),
        )
    )
    # persist the per-user metric frame: four consumers (three rank
    # passes + the user count); chaining the ranks instead would nest
    # each primitive's plan inside the next — measured 2147 exchanges
    # in the audited plan vs ~40 for three independent thin ranks.
    # Lifetime (ADVICE r9): the operator returns a LAZY frame, so it
    # cannot unpersist after its consumer materializes — the |users|-
    # row block stays cached until Spark's LRU storage eviction or
    # session end (bounded, aggregation-sized; documented not leaked-
    # by-accident).
    u = u.persist()
    r_rn = global_row_number_tiesafe(
        u.select("user_id", "recency_days"),
        ["recency_days"],
        F.col("recency_days"),
        [F.col("recency_days")],
        F.col("user_id"),
        [F.col("user_id")],
        "r_rn",
    ).select("user_id", "r_rn")
    f_rn = global_row_number_tiesafe(
        u.select("user_id", "frequency"),
        ["frequency"],
        F.lit(0) - F.col("frequency"),
        [F.col("frequency").desc()],
        F.col("user_id"),
        [F.col("user_id")],
        "f_rn",
    ).select("user_id", "f_rn")
    m_rn = global_row_number(
        u.select("user_id", "monetary"),
        F.lit(0.0) - F.col("monetary"),
        [F.col("monetary").desc(), F.col("user_id")],
        "m_rn",
    ).select("user_id", "m_rn")
    ranked = u.join(r_rn, "user_id").join(f_rn, "user_id").join(m_rn, "user_id")
    nu = F.broadcast(u.agg(F.count("*").alias("nu")))

    def score(rn: str):
        # integer floor-division: operands are non-negative longs, so
        # floor of the double divide equals DuckDB's // here
        return F.lit(1) + F.floor((F.lit(5) * (F.col(rn) - 1)) / F.col("nu")).cast(
            "long"
        )

    return ranked.crossJoin(nu).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        score("r_rn").alias("r_score"),
        score("f_rn").alias("f_score"),
        score("m_rn").alias("m_score"),
        F.concat(
            F.lit("R"),
            score("r_rn").cast("string"),
            F.lit("F"),
            score("f_rn").cast("string"),
            F.lit("M"),
            score("m_rn").cast("string"),
        ).alias("segment"),
    )


_AB_CONV_VALUE = 150.0  # conversion = any purchase above this value
_AB_Z_CRIT = 1.96  # two-sided alpha = 0.05

_AB_TEST_SQL = f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > {_AB_CONV_VALUE}
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM u GROUP BY variant
    ),
    w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
             MAX(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
             MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
             MAX(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
      FROM v
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
           ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
           ROUND((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE)) /
                 sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
                      (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
                      (1.0 / n_a + 1.0 / n_b)), 6) AS z_score,
           abs((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE)) /
               sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
                    (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
                    (1.0 / n_a + 1.0 / n_b))) > {_AB_Z_CRIT} AS significant
    FROM w
"""


@query("events_ab_test", oracle=_AB_TEST_SQL)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B significance test: users split into variants
    by id parity (the deterministic stand-in for an assignment
    column), conversion = any purchase above {_AB_CONV_VALUE}, and the
    pooled two-proportion z-test with the 1.96 two-sided decision —
    the analysis every experimentation platform runs nightly.

    Plan: one user-keyed aggregate (conversion flags fold map-side),
    one 2-row variant aggregate, one conditional pivot to a single
    row. All z-test arithmetic happens on exact integer counts, so
    both engines derive the same doubles; sqrt/division are
    IEEE-identical on identical inputs."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > _AB_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    v = u.withColumn("variant", F.col("user_id") % 2).groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("converted").cast("long").alias("n_conv")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a").cast("double")
    rb = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b")).cast(
        "double"
    )
    z = (ra - rb) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > _AB_Z_CRIT).alias("significant"),
    )


_SESSION_PATHS_TOP = 10
_SESSION_PATHS_LEN = 3

_SESSION_PATHS_SQL = f"""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > {SESSION_GAP_SEC} * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    r AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    p AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_SESSION_PATHS_LEN} GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {_SESSION_PATHS_TOP}
"""


@query("events_session_paths", oracle=_SESSION_PATHS_SQL)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: every session's first {_SESSION_PATHS_LEN}
    event types joined 'a>b>c', ranked by session count (with distinct
    users carrying each path) — the path-analysis report product teams
    read next to the funnel (events_funnel_steps gives ONE prescribed
    path a conversion rate; this SURFACES the paths).

    Plan: the gap-sessionize window (same lag→flag→running-sum as
    events_sessionize — one user-keyed shuffle), a per-session rank
    reusing the SAME partitioning (ReuseExchange: user_id ⊇
    (user_id, session_id) ordering), a bounded sorted collect (≤
    {_SESSION_PATHS_LEN} structs per session), and a path-keyed count;
    top-10 is TakeOrdered. No step holds more than a session's prefix
    in memory."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    x = e.withColumn(
        "new_sess",
        F.when(
            gap.isNull() | (gap > F.expr(f"INTERVAL {SESSION_GAP_SEC} SECONDS")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = x.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    rw = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    r = s.withColumn("rn", F.row_number().over(rw)).where(
        F.col("rn") <= _SESSION_PATHS_LEN
    )
    p = r.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda t: t["event_type"],
            ),
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_SESSION_PATHS_TOP)
    )


_SEQ_PATTERNS_TOP = 15

_SEQ_PATTERNS_SQL = f"""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > {SESSION_GAP_SEC} * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    r AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    t AS (
      SELECT user_id, session_id, event_type,
             MIN(rn) AS mn, MAX(rn) AS mx
      FROM r GROUP BY user_id, session_id, event_type
    ),
    tot AS (SELECT COUNT(DISTINCT (user_id, session_id)) AS n_total FROM t),
    pat AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             COUNT(*) AS n_sessions
      FROM t a JOIN t b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.mn < b.mx
      GROUP BY a.event_type, b.event_type
    ),
    ante AS (SELECT event_type, COUNT(*) AS n_ante FROM t GROUP BY event_type)
    SELECT antecedent, consequent, n_sessions,
           ROUND(CAST(n_sessions AS DOUBLE) / n_total, 6) AS support,
           ROUND(CAST(n_sessions AS DOUBLE) / n_ante, 6) AS confidence
    FROM pat
    JOIN ante ON ante.event_type = antecedent
    CROSS JOIN tot
    ORDER BY n_sessions DESC, antecedent, consequent
    LIMIT {_SEQ_PATTERNS_TOP}
"""


@query("events_sequential_patterns", oracle=_SEQ_PATTERNS_SQL)
def events_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining within sessions (SPADE/PrefixSpan
    shape, 2-item patterns unrolled): the top-{_SEQ_PATTERNS_TOP}
    ORDERED patterns a→b — sessions where some occurrence of type a
    precedes some occurrence of type b (not necessarily adjacent) —
    with sequence support (share of all sessions) and confidence
    (share of a-containing sessions). Extends join_market_basket's
    static co-occurrence mining with ORDER, the sequential-rule
    family (SPADE, Zaki 2001; PrefixSpan, Pei et al. 2001) behind
    next-action recommendation and funnel discovery.

    Scale (r12 rewrite, guide §2.3/§2.4 — the market-basket recipe):
    the PrefixSpan containment test collapses to rank algebra — a
    session contains a→b iff the FIRST a occurrence precedes the LAST
    b occurrence in (ts, event_id) order — so the plan never
    self-joins anything: the gap-sessionize window (ONE user-keyed
    shuffle, shared with events_sessionize/session_paths), a
    per-(session, type) first/last aggregate (≤ |types| rows per
    session; the (ts, event_id) struct order replaces the former
    row_number window — same total order, one fewer window pass), a
    per-session collect into the type array (both aggregates reuse the
    window's user_id partitioning — no new exchange), and the ordered
    pairs generated INSIDE the array (fan-out ≤ |types|² = 25 per
    session, bounded by the event-type enum, linear in sessions).
    Pattern counts, antecedent support and the session total ride ONE
    tiny tagged aggregate ((0,a,b) pairs, (1,a,·) per type row, one
    (2,·,·) session marker → ≤ |types|²+|types|+1 counted rows), which
    is localCheckpointed because its three consumers' pushed filters
    would otherwise defeat ReuseExchange and re-run the whole
    sessionize chain three times (the join_market_basket finding —
    before this rewrite the chain ran 4×: the a/b join sides, the
    session total and the antecedent aggregate each rebuilt it).
    Top-15 is TakeOrderedAndProject. Counts are exact integers; shared
    6-dp HALF_UP rounding keeps both engines ranking identically (ties
    break on the pattern keys)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    x = e.withColumn(
        "new_sess",
        F.when(
            gap.isNull() | (gap > F.expr(f"INTERVAL {SESSION_GAP_SEC} SECONDS")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = x.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # first/last occurrence per (session, type): min/max over the
    # (ts, event_id) struct IS the former min/max row_number — rn was
    # row_number ordered by exactly (ts, event_id) within the session,
    # and struct comparison is the same lexicographic order, so
    # mn(a) < mx(b) ⟺ fst(a) < lst(b) row for row.
    t = s.groupBy("user_id", "session_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("fst"),
        F.max(F.struct("ts", "event_id")).alias("lst"),
    )
    arr = t.groupBy("user_id", "session_id").agg(
        F.collect_list(F.struct("event_type", "fst", "lst")).alias("types")
    )
    pair_arr = F.expr(
        "flatten(transform(types, x -> "
        "transform(filter(types, y -> x.fst < y.lst), "
        "y -> struct(0 AS tag, x.event_type AS t1, y.event_type AS t2))))"
    )
    single_arr = F.expr(
        "transform(types, x -> struct(1 AS tag, x.event_type AS t1, '' AS t2))"
    )
    marker = F.array(
        F.struct(F.lit(2).alias("tag"), F.lit("").alias("t1"), F.lit("").alias("t2"))
    )
    kv = arr.select(
        F.explode(F.concat(pair_arr, single_arr, marker)).alias("kv")
    ).select("kv.tag", "kv.t1", "kv.t2")
    cnts = kv.groupBy("tag", "t1", "t2").agg(F.count("*").alias("cnt")).localCheckpoint()
    pat = cnts.filter(F.col("tag") == 0).select(
        F.col("t1").alias("antecedent"),
        F.col("t2").alias("consequent"),
        F.col("cnt").alias("n_sessions"),
    )
    ante = cnts.filter(F.col("tag") == 1).select(
        F.col("t1").alias("antecedent"), F.col("cnt").alias("n_ante")
    )
    tot = cnts.filter(F.col("tag") == 2).select(F.col("cnt").alias("n_total"))
    return (
        pat.join(F.broadcast(ante), "antecedent")
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "n_sessions",
            F.round(F.col("n_sessions").cast("double") / F.col("n_total"), 6).alias(
                "support"
            ),
            F.round(F.col("n_sessions").cast("double") / F.col("n_ante"), 6).alias(
                "confidence"
            ),
        )
        .orderBy(F.col("n_sessions").desc(), "antecedent", "consequent")
        .limit(_SEQ_PATTERNS_TOP)
    )


_COHORT_LTV_SQL = f"""
    WITH f AS (
      SELECT user_id, MIN(ts) AS conv_ts,
             date_trunc('week', MIN(ts)) AS cw
      FROM events
      WHERE event_type = 'purchase' AND value > {_AB_CONV_VALUE}
      GROUP BY user_id
    ),
    cs AS (SELECT cw, COUNT(*) AS cohort_size FROM f GROUP BY cw),
    e AS (
      SELECT ev.user_id, f.cw,
             CAST(date_diff('day', CAST(f.cw AS DATE),
                            CAST(date_trunc('week', ev.ts) AS DATE)) // 7
                  AS BIGINT) AS age_weeks,
             ev.value
      FROM events ev JOIN f USING (user_id)
      WHERE ev.ts >= f.conv_ts
    ),
    a AS (
      SELECT cw, age_weeks, COUNT(DISTINCT user_id) AS n_active_users,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
      FROM e GROUP BY cw, age_weeks
    ),
    c AS (
      SELECT cw, age_weeks, n_active_users,
             SUM(v) OVER (PARTITION BY cw ORDER BY age_weeks) AS cum_v
      FROM a
    )
    SELECT c.cw AS cohort_week, age_weeks, n_active_users,
           cs.cohort_size,
           ROUND(CAST(cum_v AS DOUBLE) / cs.cohort_size, 6) AS cum_value_per_user
    FROM c JOIN cs USING (cw)
"""


@query("events_cohort_ltv", oracle=_COHORT_LTV_SQL)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by the WEEK of their
    first high-value purchase (> {_AB_CONV_VALUE} — the conversion
    event; first-EVENT weeks all collapse into week one in this data,
    conversion weeks spread), and each cohort accumulates its members'
    post-conversion event value week over week, normalized per cohort
    member — the LTV-by-cohort-age matrix every growth dashboard
    draws next to retention (events_retention_cohorts counts users;
    this follows the money).

    Plan: first-conversion per user is one filtered min aggregate;
    the value stream joins it on user_id (co-partitioned with the
    aggregate — one exchange lineage under AQE); the weekly rollup is
    a (cohort, age) hash aggregate with decimal sums; the cumulative
    sum runs over the AGGREGATED |cohorts|×|ages| frame partitioned
    by cohort — bounded by the calendar, never data-sized."""
    e = load_table(spark, sf_dir, "events")
    f = (
        e.where((F.col("event_type") == "purchase") & (F.col("value") > _AB_CONV_VALUE))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("conv_ts"),
            F.date_trunc("week", F.min("ts")).alias("cw"),
        )
    )
    cs = f.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    age = (
        F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cw").cast("date"))
        / 7
    ).cast("long")
    ev = (
        e.join(f, "user_id")
        .where(F.col("ts") >= F.col("conv_ts"))
        .select("user_id", "cw", age.alias("age_weeks"), "value")
    )
    a = ev.groupBy("cw", "age_weeks").agg(
        F.countDistinct("user_id").alias("n_active_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    wc = Window.partitionBy("cw").orderBy("age_weeks")
    c = a.withColumn("cum_v", F.sum("v").over(wc))
    return c.join(cs, "cw").select(
        F.col("cw").alias("cohort_week"),
        "age_weeks",
        "n_active_users",
        "cohort_size",
        F.round(F.col("cum_v").cast("double") / F.col("cohort_size"), 6).alias(
            "cum_value_per_user"
        ),
    )


_SNAIVE_SQL = r"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.v AS actual, b.v AS forecast
      FROM h a JOIN h b ON a.event_type = b.event_type
                       AND b.hr = a.hr - INTERVAL 24 HOURS
    )
    SELECT event_type, COUNT(*) AS n_hours,
           ROUND(CAST(SUM(CAST(ROUND(abs(actual - forecast), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS mae,
           ROUND(CAST(SUM(CAST(ROUND(abs(actual - forecast) / abs(actual), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS mape
    FROM j WHERE actual <> 0 GROUP BY event_type
"""


@query("events_seasonal_naive_mape", oracle=_SNAIVE_SQL)
def events_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast error: predict each hour's per-type
    value sum with the value 24 hours earlier and report MAE/MAPE per
    type — the baseline every forecasting effort must beat (Hyndman &
    Athanasopoulos, FPP §5.2), and the denominator in MASE. Completes
    the time-series suite's eval side (events_seasonal_decompose
    models; this scores).

    Plan: one hourly rollup (map-side combined), then a self equi-join
    of the BOUNDED (type, hour) frame on the 24-hour-shifted key — the
    joined frame is |types|×|hours|, never event-sized. Absolute
    errors round to 6 dp and sum as DECIMAL(18,6), so both engines'
    means are addition-order-free."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    a = h.select("event_type", "hr", F.col("v").alias("actual"))
    b = h.select(
        "event_type",
        (F.col("hr") + F.expr("INTERVAL 24 HOURS")).alias("hr"),
        F.col("v").alias("forecast"),
    )
    j = a.join(b, ["event_type", "hr"]).where(F.col("actual") != 0)
    ae = F.abs(F.col("actual") - F.col("forecast"))
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.round(
            F.sum(F.round(ae, 6).cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("mae"),
        F.round(
            F.sum(F.round(ae / F.abs(F.col("actual")), 6).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("mape"),
    )


_STICKINESS_SQL = r"""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    mau AS (
      SELECT days.d, COUNT(DISTINCT ud.user_id) AS mau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - INTERVAL 27 DAYS AND days.d
      GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau, mau.mau,
           ROUND(dau.dau / CAST(mau.mau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
"""


@query("events_dau_mau_stickiness", oracle=_STICKINESS_SQL)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day: daily actives over trailing-28-day
    actives — the engagement ratio product dashboards track beside
    retention (events_retention_cohorts) and WAU (sketch_hll_sliding's
    approximate sibling; this is the exact small-window form).

    Plan: events first dedupe to the (user, day) frame — the ONLY
    data-sized step, one hash aggregate; DAU is a day-keyed count of
    that frame; MAU range-joins the bounded day spine against the
    (user, day) frame (|days| × active-days rows, calendar-bounded
    fan-out of ≤ 28 per row) and distinct-counts per day. At 100 TB
    the exact form holds while |days|×|users| stays join-able;
    past that the HLL register merge (sketch_hll_sliding) is the
    documented swap, same contract."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    # each active (user, day) counts toward the NEXT 27 days' MAU:
    # explode the bounded 28-day window and the range join becomes a
    # plain day-keyed equi-aggregate (no nested-loop range join);
    # days past the corpus end drop in the inner join against dau
    counting = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr("INTERVAL 27 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    mau = counting.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, dau["d"] == mau["day"])
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias("stickiness"),
        )
    )
