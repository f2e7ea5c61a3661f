"""Embedding-column utilities (north-star extension; BASELINE.json):
L2 stats + int8 quantization, and exact per-label centroids — the
vector-side prep steps (normalize → quantize → cluster stats) that sit
next to the ANN operators in a training-data pipeline.

Determinism: cross-element sums go through DECIMAL(38,12) so the
result is independent of addition order (registry rules); per-element
quantization uses FLOOR(x+0.5) rather than round() (identical IEEE
expression tree in both engines, no engine-specific rounding mode).

Scale: both queries are a single scan + (for centroids) one
explode→agg shuffle keyed by (label, pos) — |labels|×dim output rows,
partial aggregation map-side. No joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

_DEC = "decimal(38,12)"


def _vec_d(col):
    """float[] -> double[] (all math in doubles, cast once)."""
    return F.transform(col, lambda x: x.cast("double"))


@query(
    "emb_normalize_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    m AS (
      SELECT vec_id, e,
             list_sum(list_transform(e, x -> CAST(x*x AS DECIMAL(38,12)))) AS ss,
             nullif(list_max(list_transform(e, x -> abs(x))), 0) AS max_abs
      FROM v
    )
    SELECT vec_id,
           ROUND(sqrt(CAST(ss AS DOUBLE)), 6) AS l2_norm,
           ROUND(max_abs, 6) AS max_abs,
           md5(array_to_string(list_transform(e,
             x -> CAST(FLOOR(x / max_abs * 127.0 + 0.5) AS BIGINT)), ','))
             AS q_digest
    FROM m
    """,
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and symmetric int8 quantization (scale =
    max|x|/127), with the quantized codes digest-gated so both engines
    must produce the identical 64 int8 values per vector.

    One scan, zero shuffles — the whole thing runs inside the scan
    pipeline; at 100 TB this is the map stage of an embedding
    compaction job."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = _vec_d(F.col("embedding"))
    withm = emb.select(
        "vec_id",
        e.alias("e"),
        F.aggregate(
            F.transform(e, lambda x: (x * x).cast(_DEC)),
            F.lit(0).cast(_DEC),
            # Spark widens decimal + to (38,11); re-cast keeps the
            # accumulator type stable (values ≪ 1e26, cast is exact)
            lambda acc, x: (acc + x).cast(_DEC),
        ).alias("ss"),
        F.nullif(F.array_max(F.transform(e, F.abs)), F.lit(0.0)).alias("max_abs"),
    )
    quant = F.transform(
        F.col("e"),
        lambda x: F.floor(x / F.col("max_abs") * 127.0 + 0.5).cast("long"),
    )
    return withm.select(
        "vec_id",
        F.round(F.sqrt(F.col("ss").cast("double")), 6).alias("l2_norm"),
        F.round("max_abs", 6).alias("max_abs"),
        F.md5(F.concat_ws(",", F.transform(quant, lambda q: q.cast("string")))).alias(
            "q_digest"
        ),
    )


@query(
    "emb_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding::DOUBLE[]) AS DECIMAL(38,12)) AS x
      FROM embeddings
    )
    SELECT label, pos,
           COUNT(*) AS n,
           ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS centroid
    FROM flat GROUP BY label, pos
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label centroids in long form (label, dim position,
    mean) — the k-means/IVF 'update' step as one declarative pass.

    posexplode → groupBy(label, pos) with decimal sums: the shuffle
    carries |labels| × dim partial aggregates per task (map-side
    combine), never raw vectors."""
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    flat = emb.select(
        "label",
        F.posexplode(_vec_d(F.col("embedding"))).alias("pos", "xd"),
    ).select("label", "pos", F.col("xd").cast(_DEC).alias("x"))
    return flat.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.round(F.sum("x").cast("double") / F.count("*"), 6).alias("centroid"),
    )
