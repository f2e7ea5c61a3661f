"""Weighted sampling without replacement (Efraimidis & Spirakis 2006,
"Weighted random sampling with a reservoir"): the curation-side
primitive for drawing a fixed-size sample where selection probability
tracks a per-document weight — here document length (n_chars), the
standard proxy when mixing long-form sources into a token budget.

Method: each document draws a deterministic uniform u from md5(doc_id)
(a 60-bit dyadic rational, exactly representable, identical in both
engines — the curation.py hash-bucket idiom) and gets the exponential
key -ln(u) / w; the k SMALLEST keys win. This is the A-ES formulation,
equivalent to u^(1/w) top-k but numerically tamer; it is also the
distributed-reservoir shape — keys are row-local, so the sample is a
global top-k (TakeOrderedAndProject), no shuffle of the corpus.

Determinism (registry rules): u is exact; ln on identical doubles is
bit-identical (tfidf precedent); the key is ROUND(·, 12) before the
rank with a doc_id tie-break.

Reference parity note: the reference (snowplow/kinesis-s3) has no
query surface (SURVEY.md §2) — this extends the LLM-curation north
star next to curation_stratified_sample (equal-probability strata)
and curation_token_budget_sample (greedy budget fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

SAMPLE_K = 50
_U_DENOM = 1 << 60  # md5 60-bit prefix -> u in (0, 1], exact dyadic

_WEIGHTED_SAMPLE_SQL = f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(
               -ln(
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                  / {_U_DENOM}.0)
               ) / n_chars,
               12) AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, es_key, rank FROM (
      SELECT doc_id, n_chars, es_key,
             ROW_NUMBER() OVER (ORDER BY es_key ASC, doc_id) AS rank
      FROM keyed
    ) WHERE rank <= {SAMPLE_K}
"""


@query("curation_weighted_sample", oracle=_WEIGHTED_SAMPLE_SQL)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample of {SAMPLE_K} documents via exponential
    keys (block comment above): P(selected) increases with n_chars,
    without replacement, reproducible run to run.

    Plan: the key is computed inside the scan (row-local md5 + ln);
    the sample is a global TakeOrderedAndProject on (key, doc_id) —
    the distributed-reservoir shape. 100 TB: no corpus shuffle at all;
    each task keeps its local top-k and the driver merges k-sized
    heaps."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(float(_U_DENOM))
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.round(-F.log(u) / F.col("n_chars"), 12).alias("es_key"),
    )
    win = Window.orderBy(F.col("es_key").asc(), F.col("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= SAMPLE_K)
        .select("doc_id", "n_chars", "es_key", "rank")
    )
