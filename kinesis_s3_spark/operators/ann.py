"""Approximate-nearest-neighbor search over the embeddings table
(north-star extension; BASELINE.json).

Two paths, as SURVEY §7 prescribes:
- brute-force cosine top-k — the exact baseline every ANN variant is
  measured against (fine up to ~10M vectors × small query sets);
- random-hyperplane LSH bucketing — the 100 TB path: one linear pass
  computes a 6-bit signature per vector; queries multi-probe their
  bucket plus every 1-bit flip (7 probes), so candidates come from an
  equi-join on the probed bucket, never a cross join.

The hyperplanes are DERIVED FROM md5 (seeded, no RNG) so the DuckDB
oracle regenerates bit-identical planes in SQL and the gate checks the
full pipeline: planes → signs → buckets → candidate join → top-k.
Sign(dot) is fp-robust across engines: a flip would need |dot| below
double ulp.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_s3_spark.operators.dedup import cosine_sim
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

DIM = 64
N_PLANES = 6
N_QUERIES = 5  # query set = vec_id 0..4
TOP_K = 10


def _plane_component(j: int, k: int) -> float:
    """Deterministic pseudo-random component in [-1, 1]:
    md5(j*DIM+k) → 60-bit int → mod 2001 → scaled. The DuckDB oracle
    computes the identical expression from the same md5."""
    h = int(hashlib.md5(str(j * DIM + k).encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


def hyperplanes() -> list[list[float]]:
    return [[_plane_component(j, k) for k in range(DIM)] for j in range(N_PLANES)]


_PLANES_SQL = f"""
    planes AS (
      SELECT j,
             [(((('0x' || substr(md5(CAST(j*{DIM}+k AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)
              for k in range(0, {DIM})] AS p
      FROM (SELECT unnest(range(0, {N_PLANES})) AS j)
    )
"""


def lsh_bucket(vec: Column) -> Column:
    """Signature: bit j = (v · plane_j >= 0). Planes are plan
    literals (broadcast with the task binary) — one fused pass per row,
    no joins, no Python."""
    planes = hyperplanes()
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id != 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector: broadcast the query,
    one fused scan computes scores, TakeOrdered keeps k — no global
    sort, no shuffle of the vector table."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("qe")), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@query(
    "ann_multi_query_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES})
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT q.q_id, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id
               ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) DESC,
                        e.vec_id) AS rank
      FROM embeddings e JOIN q ON e.vec_id != q.q_id
    ) WHERE rank <= 5
    """,
)
def ann_multi_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k: broadcast the query set, score all
    (query, vector) combos in one pass, per-query Window keeps 5.
    Scale: cost is |queries| × |vectors| — the reason the LSH variant
    below exists for large query sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("qe")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH {_PLANES_SQL},
    sig AS (
      SELECT e.vec_id, e.embedding,
             CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.p) >= 0
                           THEN (1 << p.j) ELSE 0 END) AS INT) AS bucket
      FROM embeddings e, planes p
      GROUP BY e.vec_id, e.embedding
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS qe,
             unnest([bucket] || [xor(bucket, 1 << j) for j in range({N_PLANES})]) AS probe
      FROM sig WHERE vec_id < {N_QUERIES}
    )
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT q.q_id, s.vec_id,
             ROUND(list_cosine_similarity(s.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id
               ORDER BY ROUND(list_cosine_similarity(s.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) DESC,
                        s.vec_id) AS rank
      FROM sig s JOIN q ON s.bucket = q.probe AND s.vec_id != q.q_id
    ) WHERE rank <= 3
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: 6-bit signatures in one linear pass; each
    query probes its own bucket plus every 1-bit neighbor (7 probes),
    then top-3 among candidates only.

    Scale: candidates come from an equi-join of vectors against the
    probed bucket list (7 x bucket-size rows per query, vs N for brute
    force); recall/cost tunes via N_PLANES and the probe radius —
    brute force above is the recall yardstick (tests/test_ann.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = emb.withColumn("bucket", lsh_bucket(F.col("embedding")))
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)],
    )
    q = F.broadcast(
        sig.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.explode(probes).alias("probe"),
        )
    )
    scored = (
        sig.join(q, (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("qe")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
