"""DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169):
score every raw document by the log-likelihood ratio of a TARGET
distribution vs the RAW distribution over hashed n-gram features —
the importance-resampling selection signal a pretraining pipeline uses
to tilt a web crawl toward a quality domain.

Concretely: features are word bigrams hashed to B=512 buckets (md5,
the sketches.py idiom, so both engines hash identically); the target
is the English slice (lang = 'en'), the raw corpus is everything;
bucket distributions are Laplace-smoothed occurrence frequencies; a
document's log-ratio is the sum over its bigram OCCURRENCES of
ln(p_target(bucket) / p_raw(bucket)).

Determinism (registry rules): the per-occurrence ln(·) is evaluated on
an expression written IDENTICALLY in both engines (two nested
divisions — same literal shapes, same order), rounded to 6 dp, then
summed as DECIMAL(18,6); the final ranking carries a doc_id tie-break.

Scale: one bigram explode; one (bucket) aggregation whose output is
<= B rows (broadcast); one 1-row totals frame (broadcast); one
(doc_id) decimal-sum shuffle. Everything corpus-sized moves exactly
twice (bucket counting, contribution scoring) through the cached
occurrence frame — at 100 TB both shuffles key on uniform md5 buckets
/ doc ids. The reference (snowplow/kinesis-s3) has no query surface
(SURVEY.md §2); this extends the LLM-curation north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.functions.text import tokens
from kinesis_s3_spark.operators.ranking import global_row_number
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"

# shared feature pipeline: trimmed lowercase whitespace tokens ->
# 1-based adjacent bigrams -> 60-bit md5 bucket
_BIGRAMS_SQL = r"""
      SELECT doc_id, lang = '{tl}' AS is_target,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {b} AS bucket
      FROM (
        SELECT doc_id, lang,
               unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS g
        FROM (
          SELECT doc_id, lang,
                 string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents WHERE length(trim(text)) > 0
        )
      )
""".format(tl=DSIR_TARGET_LANG, b=DSIR_BUCKETS)

_DSIR_SQL = f"""
    WITH occ AS ({_BIGRAMS_SQL}),
    buckets AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_r,
             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      FROM occ GROUP BY bucket
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS tot_r,
             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS DOUBLE) AS tot_t
      FROM occ
    ),
    contrib AS (
      SELECT o.doc_id,
             CAST(ROUND(
               ln(((b.n_t + 1.0) / (s.tot_t + {DSIR_BUCKETS}))
                  / ((b.n_r + 1.0) / (s.tot_r + {DSIR_BUCKETS}))),
               6) AS DECIMAL(18, 6)) AS c
      FROM occ o JOIN buckets b USING (bucket) CROSS JOIN totals s
    ),
    scores AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(c) AS DOUBLE) AS log_ratio
      FROM contrib GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           COALESCE(s.log_ratio, 0.0) AS log_ratio,
           ROW_NUMBER() OVER (
             ORDER BY COALESCE(s.log_ratio, 0.0) DESC, d.doc_id
           ) AS rank
    FROM documents d LEFT JOIN scores s USING (doc_id)
"""


@query("curation_dsir_weights", oracle=_DSIR_SQL)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance score against the English target
    slice: hashed-bigram log-likelihood ratio (positive = looks like
    the target distribution), bigram count, and the resampling rank
    (desc log-ratio, doc_id tie-break). Documents with < 2 tokens
    carry a 0 score and sort by id within their tie.

    Plan: ONE bigram explode cached as the occurrence frame; bucket
    stats (<= {DSIR_BUCKETS} rows) and totals (1 row) aggregate off
    it and come back as broadcasts; contributions are then row-local
    and decimal-sum on doc_id. The 1-row totals cross join is
    broadcast-tiny by construction (plan-audit allowlisted)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
        tokens(F.lower(F.col("text"))).alias("t"),
    )
    grams = toks.select(
        "doc_id",
        "is_target",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("g"),
    )
    occ = grams.select(
        "doc_id",
        "is_target",
        (
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("bucket"),
    ).cache()
    # r13 (guide §2.4): totals derive from the ≤{DSIR_BUCKETS}-row
    # bucket frame (every occurrence has a bucket, and the sums are
    # exact integers either way) instead of a SECOND full aggregate
    # pass over the corpus-sized occurrence frame — one cache scan
    # fewer at any scale, bit-identical broadcast values.
    buckets = occ.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_r"),
        F.sum(F.col("is_target").cast("long")).cast("long").alias("n_t"),
    ).cache()
    totals = buckets.agg(
        F.sum("n_r").cast("double").alias("tot_r"),
        F.sum("n_t").cast("double").alias("tot_t"),
    )
    contrib = (
        occ.join(F.broadcast(buckets), "bucket")
        .join(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log(
                    ((F.col("n_t") + 1.0) / (F.col("tot_t") + DSIR_BUCKETS))
                    / ((F.col("n_r") + 1.0) / (F.col("tot_r") + DSIR_BUCKETS))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    scores = contrib.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("c").cast("double").alias("log_ratio"),
    )
    base = (
        docs.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("log_ratio"), F.lit(0.0)).alias("log_ratio"),
        )
    )
    # descending leading key -> negated numeric bucket projection; the
    # two-phase primitive keeps the resampling rank off one executor
    return global_row_number(
        base,
        F.lit(0.0) - F.col("log_ratio"),
        [F.col("log_ratio").desc(), F.col("doc_id")],
        "rank",
    )
