"""Invariant tests for the r9 additions: cross-doc duplicate n-gram
coverage, last-touch attribution, and CDC MERGE semantics. Oracle
value equality is covered by tools/check_correctness.py; these pin the
semantic invariants a hash compare can't express."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from tests.conftest import SF_CORRECT

_LOOKBACK_US = 7 * 86400 * 1_000_000


def test_ngram_coverage_bounds_and_dups(spark):
    df = entrymod.queries()["dedup_ngram_coverage"](spark, SF_CORRECT).cache()
    # coverage is a position count: 0 <= covered <= n_tokens
    assert df.filter(F.col("covered_tokens") < 0).count() == 0
    assert df.filter(F.col("covered_tokens") > F.col("n_tokens")).count() == 0
    # every doc appears exactly once
    assert df.count() == df.select("doc_id").distinct().count()
    # the testdata plants near-duplicate docs: some doc must be almost
    # fully covered, and the keep verdict must match the 0.3 threshold
    assert df.filter(F.col("dup_frac") >= 0.9).count() >= 1
    assert df.filter(F.col("keep") != (F.col("dup_frac") <= 0.3)).count() == 0
    # docs shorter than the 5-gram window can have no coverage
    assert df.filter((F.col("n_tokens") < 5) & (F.col("covered_tokens") > 0)).count() == 0


def test_ngram_coverage_matches_bruteforce_interval_union(spark):
    """r12 rewrite guard: covered_tokens = sum(min(5, gap)) over sorted
    dup-gram starts must equal the brute-force union of width-5
    position intervals (the pre-r12 explode + COUNT(DISTINCT pos)
    formulation), and the window dup flag (min!=max doc over the gram)
    must reproduce the nd>=2 group filter."""
    from pyspark.sql import Window

    from kinesis_s3_spark.functions.text import ngrams_from_tokens, tokens
    from kinesis_s3_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents").where(
        F.length(F.trim("text")) > 0
    )
    base = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("t"))
    grams = base.where(F.size("t") >= 5).select(
        "doc_id", F.posexplode(ngrams_from_tokens(F.col("t"), 5)).alias("p", "g")
    )
    dupg = (
        grams.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    brute = (
        grams.join(dupg, "g")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(4))).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("pos").alias("covered_tokens"))
    )
    prod = (
        entrymod.queries()["dedup_ngram_coverage"](spark, SF_CORRECT)
        .where(F.col("covered_tokens") > 0)
        .select("doc_id", "covered_tokens")
    )
    assert prod.exceptAll(brute).count() == 0
    assert brute.exceptAll(prod).count() == 0


def test_attribution_partitions_purchases(spark):
    q = entrymod.queries()
    df = q["events_attribution"](spark, SF_CORRECT).cache()
    rows = {r["channel"]: r for r in df.collect()}
    # attribution partitions purchases: channel totals == #purchases
    from kinesis_s3_spark.sources.tables import load_table

    n_purchases = (
        load_table(spark, SF_CORRECT, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_conversions"] for r in rows.values()) == n_purchases
    assert set(rows) <= {"click", "view", "signup", "error", "direct"}
    # direct = no in-window touch: carries no delay
    if "direct" in rows:
        assert rows["direct"]["sum_delay_us"] is None
    # attributed delays respect the lookback bound
    for ch, r in rows.items():
        if ch != "direct" and r["avg_delay_us"] is not None:
            assert 0 <= r["avg_delay_us"] <= _LOOKBACK_US


def test_cdc_merge_action_semantics(spark):
    df = entrymod.queries()["etl_cdc_merge"](spark, SF_CORRECT).cache()
    # one action per key
    assert df.count() == df.select("user_id").distinct().count()
    assert df.filter(~F.col("action").isin("insert", "update", "delete")).count() == 0
    # deletes are tombstones: no new state; and they must have matched
    d = df.filter(F.col("action") == "delete")
    assert d.filter(F.col("new_type").isNotNull() | F.col("new_value").isNotNull()).count() == 0
    assert d.filter(F.col("old_type").isNull()).count() == 0
    # inserts never matched; updates always did
    assert df.filter((F.col("action") == "insert") & F.col("old_type").isNotNull()).count() == 0
    assert df.filter((F.col("action") == "update") & F.col("old_type").isNull()).count() == 0
    # new state rows never expose a tombstone type
    assert df.filter(F.col("new_type") == "error").count() == 0


def test_lpa_structural_invariants(spark):
    df = entrymod.queries()["graph_label_propagation"](spark, SF_CORRECT).cache()
    n = df.count()
    # every node labeled exactly once
    assert n == df.select("vec_id").distinct().count()
    # community ids are node ids (labels start as vec_id and only
    # propagate — they never leave the id domain)
    ids = {r[0] for r in df.select("vec_id").collect()}
    assert {r[0] for r in df.select("community").distinct().collect()} <= ids
    # n_members is the community's actual row count, and sizes sum to n
    sizes = {r["community"]: r["cnt"] for r in
             df.groupBy("community").count().withColumnRenamed("count", "cnt").collect()}
    for r in df.collect():
        assert r["n_members"] == sizes[r["community"]]
    assert sum(sizes.values()) == n
    # propagation actually merges: fewer communities than nodes
    assert len(sizes) < n


def test_rfm_quintile_invariants(spark):
    df = entrymod.queries()["events_rfm_segments"](spark, SF_CORRECT).cache()
    n = df.count()
    assert n == df.select("user_id").distinct().count()
    for c in ("r_score", "f_score", "m_score"):
        assert df.filter((F.col(c) < 1) | (F.col(c) > 5)).count() == 0
        # quintiles from a total-order rank are balanced to within 1
        counts = [r["cnt"] for r in
                  df.groupBy(c).agg(F.count("*").alias("cnt")).collect()]
        assert max(counts) - min(counts) <= 1
    # segment string is exactly the three scores
    recon = F.concat(F.lit("R"), F.col("r_score").cast("string"),
                     F.lit("F"), F.col("f_score").cast("string"),
                     F.lit("M"), F.col("m_score").cast("string"))
    assert df.filter(F.col("segment") != recon).count() == 0


def test_rake_phrase_invariants(spark):
    from kinesis_s3_spark.operators.text import (
        _RAKE_MAX_PHRASE,
        _RAKE_STOPS,
        _RAKE_TOP,
    )

    rows = entrymod.queries()["text_rake_keywords"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= _RAKE_TOP
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r["phrase"].split(" ")
        assert 1 <= len(words) <= _RAKE_MAX_PHRASE
        assert not set(words) & set(_RAKE_STOPS)  # stopword-free runs
        assert r["n_docs"] <= r["n_occurrences"]


def test_source_overlap_cells(spark):
    rows = entrymod.queries()["dedup_source_overlap"](spark, SF_CORRECT).collect()
    assert rows  # the testdata plants cross-source near-dups
    seen = set()
    for r in rows:
        assert r["source_a"] <= r["source_b"]  # unordered cell, one row
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["n_pairs"] >= 1
        # verified pairs all pass the 0.7 Jaccard gate
        assert 0.7 <= r["mean_jaccard"] <= 1.0


def test_ab_test_consistency(spark):
    from kinesis_s3_spark.sources.tables import load_table

    r = entrymod.queries()["events_ab_test"](spark, SF_CORRECT).collect()[0]
    n_users = load_table(spark, SF_CORRECT, "events").select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    assert 0 <= r["conv_a"] <= r["n_a"] and 0 <= r["conv_b"] <= r["n_b"]
    assert r["significant"] == (abs(r["z_score"]) > 1.96)
    assert (r["z_score"] > 0) == (r["rate_a"] > r["rate_b"])


def test_session_paths_shape(spark):
    rows = entrymod.queries()["events_session_paths"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"click", "view", "signup", "error", "purchase"}
    for r in rows:
        segs = r["path"].split(">")
        assert 1 <= len(segs) <= 3
        assert set(segs) <= types
        assert 1 <= r["n_users"] <= r["n_sessions"]


def test_cohort_ltv_monotone(spark):
    rows = entrymod.queries()["events_cohort_ltv"](spark, SF_CORRECT).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert 1 <= r["n_active_users"] <= r["cohort_size"]
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    assert len(by_cohort) >= 2  # conversion weeks actually spread
    for _, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_weeks"])
        # cumulative value per member never decreases with age
        vals = [r["cum_value_per_user"] for r in rs]
        assert vals == sorted(vals)
        # ages start at the conversion week
        assert rs[0]["age_weeks"] == 0


def test_outlier_report_standardized(spark):
    df = entrymod.queries()["emb_outlier_report"](spark, SF_CORRECT).cache()
    n = df.count()
    assert n == df.select("vec_id").distinct().count()
    # z-scores standardize within label: per-label mean ~ 0, and the
    # outlier flag is exactly the |z| > 2 rule
    stats = df.groupBy("label").agg(
        F.avg("z_score").alias("mz"), F.count("*").alias("cnt")
    ).collect()
    for r in stats:
        assert abs(r["mz"]) < 0.01
    assert df.filter(df.is_outlier != (F.abs(df.z_score) > 2)).count() == 0
    # flags exist but are rare (|z|>2 on roughly-normal cosines)
    n_out = df.filter("is_outlier").count()
    assert 0 < n_out < 0.15 * n


def test_link_prediction_invariants(spark):
    from kinesis_s3_spark.operators.ann import _knn_join_ivf
    from kinesis_s3_spark.operators.graph import LINK_PRED_TOP

    rows = entrymod.queries()["graph_link_prediction"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= LINK_PRED_TOP
    js = [r["jaccard"] for r in rows]
    assert js == sorted(js, reverse=True)
    # predicted links are non-adjacent pairs: none may be a kNN edge
    knn = _knn_join_ivf(spark, SF_CORRECT).select("vec_id", "nbr_id").collect()
    edges = {(r["vec_id"], r["nbr_id"]) for r in knn}
    edges |= {(b, a) for a, b in edges}
    for r in rows:
        assert r["u"] < r["v"]
        assert (r["u"], r["v"]) not in edges
        assert 0 < r["jaccard"] <= 1
        assert r["common_neighbors"] >= 1


def test_tfidf_simjoin_finds_planted_dups(spark):
    from kinesis_s3_spark.operators.text import _SIMJOIN_TOP

    rows = entrymod.queries()["text_tfidf_simjoin"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= _SIMJOIN_TOP
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0 < r["cosine"] <= 1.000001
    # the corpus plants exact near-dups: sparse cosine must surface
    # some at ~1.0
    assert cos[0] >= 0.99


def test_seasonal_naive_error_bounds(spark):
    rows = entrymod.queries()["events_seasonal_naive_mape"](spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == {"click", "view", "signup", "error", "purchase"}
    for r in rows:
        assert r["n_hours"] > 0
        assert r["mae"] >= 0 and r["mape"] >= 0


def test_stickiness_bounds(spark):
    rows = entrymod.queries()["events_dau_mau_stickiness"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        # DAU is a subset of the trailing-28-day actives by definition
        assert 1 <= r["dau"] <= r["mau"]
        assert 0 < r["stickiness"] <= 1
        assert abs(r["stickiness"] - r["dau"] / r["mau"]) < 1e-5
