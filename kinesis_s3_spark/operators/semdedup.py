"""Semantic deduplication via cluster blocking (SemDeDup, Abbas et al.
2023, arXiv:2303.09540): k-means the embedding space, then compare
vectors pairwise ONLY within their cluster and drop every vector that
has a sufficiently-similar lower-id neighbor. This is the third
candidate-generation mechanism in the dedup family — exact hashing
(dedup_exact), LSH bucketing (dedup_embedding_lsh_strict), and now
centroid blocking — each trading recall shape for candidate count
differently.

Composition: reuses emb_kmeans's Lloyd machinery verbatim
(lloyd_centroids / _km_assign, embeddings.py) on the twin-augmented
corpus from the strict-LSH operator (ann.py: the synthetic corpus has
no natural pairs above the production threshold, so both engines plant
identical md5-noise twins — cosine(v, twin) ≈ 0.9996). The DuckDB
oracle unrolls both Lloyd rounds AND the pair pruning in one WITH
chain, so the gate checks clustering, blocking, and verdicts end to
end.

Determinism (registry rules): assignment distances rounded to 4 dp
with cid tie-break (IVF rule); centroid means via DECIMAL(38,12) and
ROUND 6 (emb_label_centroids rule); pair cosine rounded to 4 dp before
the threshold compare; dup_of = MIN lower-id neighbor; nullable ints
coalesced to -1 so both engines emit identical concrete values.

Scale (the SemDeDup argument): candidates are sum_c |c|^2 / 2 — an
equi-join on cid, never a cartesian. k grows with the corpus
(k ~ n / target_cluster_size), holding per-cluster cost constant, so
the pair stage stays ~linear while the clustering stage is the
emb_kmeans plan (two scans + one k x dim shuffle per round). The
reference (snowplow/kinesis-s3) has no query surface (SURVEY.md §2);
this extends the LLM-curation north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.ann import (
    PLANT_N,
    PLANT_OFFSET,
    _STRICT_AUG_SQL,
    _strict_aug,
)
from kinesis_s3_spark.operators.dedup import cosine_sim
from kinesis_s3_spark.operators.embeddings import (
    _KM_ASSIGN_SQL,
    _KM_UPDATE_SQL,
    _dot,
    _km_assign,
    lloyd_centroids,
)
from kinesis_s3_spark.operators.registry import query

SEM_K = 8  # same cluster count as emb_kmeans
SEM_ITERS = 2  # same Lloyd depth as emb_kmeans (oracle unrolls both)
SEM_THRESHOLD = 0.85  # the strict-LSH production threshold

# Lloyd chain on the AUGMENTED corpus: same assign/update templates as
# _KMEANS_SQL, with v/vv sourced from aug instead of embeddings.
def _sem_kmeans_chain(k: int) -> str:
    return (
        f"""
    WITH {_STRICT_AUG_SQL},
    v AS (SELECT vec_id, embedding AS e FROM aug),
    vv AS (SELECT vec_id, e, list_dot_product(e, e) AS ee FROM v),
    c0 AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id < {k}),
    """
        + _KM_ASSIGN_SQL.format(a="a0", c="c0", dist_col="", vv="vv")
        + ","
        + _KM_UPDATE_SQL.format(f="f1", a="a0", m="m1", c="c1", v="v")
        + ","
        + _KM_ASSIGN_SQL.format(a="a1", c="c1", dist_col="", vv="vv")
        + ","
        + _KM_UPDATE_SQL.format(f="f2", a="a1", m="m2", c="c2", v="v")
        + ","
        + _KM_ASSIGN_SQL.format(a="a2", c="c2", dist_col="", vv="vv")
    )


_SEM_KMEANS_CHAIN = _sem_kmeans_chain(SEM_K)

_SEM_PAIRS_CTE = f"""
    simpairs AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2
      FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN v va ON a.vec_id = va.vec_id
      JOIN v vb ON b.vec_id = vb.vec_id
      WHERE ROUND(list_cosine_similarity(va.e, vb.e), 4) >= {SEM_THRESHOLD}
    )
"""

_SEMDEDUP_SQL = (
    _SEM_KMEANS_CHAIN
    + ","
    + _SEM_PAIRS_CTE
    + """,
    dups AS (
      SELECT v2 AS vec_id, MIN(v1) AS dup_of, COUNT(*) AS n_sim
      FROM simpairs GROUP BY v2
    )
    SELECT a.vec_id, a.cid AS cluster,
           d.vec_id IS NULL AS keep,
           COALESCE(d.dup_of, -1) AS dup_of,
           COALESCE(d.n_sim, 0) AS n_sim
    FROM a2 a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""
)


def _sem_assign(spark: SparkSession, sf_dir: str, k: int = SEM_K) -> DataFrame:
    """(vec_id, e, cid) for the twin-augmented corpus after SEM_ITERS
    Lloyd rounds — cached because the pair join reads it twice."""
    aug = _strict_aug(spark, sf_dir)
    vv = (
        aug.select("vec_id", F.col("embedding").alias("e"))
        .withColumn("ee", _dot(F.col("e"), F.col("e")))
        .cache()
    )
    cents = lloyd_centroids(vv, k, SEM_ITERS)
    return _km_assign(vv, cents, with_dist=False).cache()


def _sem_pairs(assign: DataFrame) -> DataFrame:
    """(v1, v2) within-cluster pairs at rounded cosine >= threshold."""
    a = assign.select(
        F.col("cid"), F.col("vec_id").alias("v1"), F.col("e").alias("e1")
    )
    b = assign.select(
        F.col("cid"), F.col("vec_id").alias("v2"), F.col("e").alias("e2")
    )
    return (
        a.join(b, "cid")
        .filter(F.col("v1") < F.col("v2"))
        .filter(
            F.round(cosine_sim(F.col("e1"), F.col("e2")), 4) >= SEM_THRESHOLD
        )
        .select("v1", "v2")
    )


@query("dedup_semantic", oracle=_SEMDEDUP_SQL)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts over the twin-augmented corpus: per vector,
    its k-means cluster, whether it survives (no same-cluster neighbor
    at rounded cosine >= 0.85 with a smaller vec_id), the minimum such
    neighbor (-1 if kept), and how many it had.

    Plan: the emb_kmeans two-round Lloyd loop (centroid literal scans,
    k x dim driver collect per round), then ONE equi-join of the cached
    assignment frame with itself on cid + exact cosine on candidates
    only, then a (vec_id) left anti-ish aggregation for the verdicts.
    100 TB: candidates bounded by cluster size (k scales with n), the
    only corpus-wide shuffles key on cid / vec_id — cartesian-free by
    construction."""
    assign = _sem_assign(spark, sf_dir)
    dups = (
        _sem_pairs(assign)
        .groupBy(F.col("v2").alias("vec_id"))
        .agg(F.min("v1").alias("dup_of"), F.count("*").alias("n_sim"))
    )
    return (
        assign.select("vec_id", F.col("cid").alias("cluster"))
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).alias("dup_of"),
            F.coalesce(F.col("n_sim"), F.lit(0)).alias("n_sim"),
        )
    )


_SEM_RECALL_SQL = (
    _SEM_KMEANS_CHAIN
    + ","
    + _SEM_PAIRS_CTE
    + f""",
    truth AS (
      SELECT vec_id AS v1, vec_id + {PLANT_OFFSET} AS v2
      FROM embeddings WHERE vec_id < {PLANT_N}
    ),
    caught AS (
      SELECT COUNT(*) AS n FROM truth t
      JOIN simpairs p ON t.v1 = p.v1 AND t.v2 = p.v2
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           caught.n AS n_caught,
           ROUND(CAST(caught.n AS DOUBLE) / (SELECT COUNT(*) FROM truth), 4)
             AS recall
    FROM caught
"""
)


@query("dedup_semantic_recall", oracle=_SEM_RECALL_SQL)
def dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effectiveness gate for the cluster-blocking mechanism: of the
    planted twin pairs (ground truth, cosine ~0.9996), how many does
    SemDeDup catch? A twin is caught iff both copies land in the SAME
    k-means cluster (the blocking decision) — the exact failure mode
    centroid blocking introduces vs LSH. Recall is asserted >= 0.9 by
    tests/test_semdedup.py; the oracle recomputes the same number
    through the unrolled SQL chain."""
    assign = _sem_assign(spark, sf_dir)
    pairs = _sem_pairs(assign)
    truth = (
        assign.filter(F.col("vec_id") < PLANT_N)
        .select(
            F.col("vec_id").alias("v1"),
            (F.col("vec_id") + PLANT_OFFSET).alias("v2"),
        )
    )
    n_true = truth.count()
    caught = truth.join(pairs, ["v1", "v2"]).agg(
        F.count("*").alias("n_caught")
    )
    return caught.select(
        F.lit(n_true).alias("n_true"),
        F.col("n_caught"),
        F.round(F.col("n_caught").cast("double") / F.lit(n_true), 4).alias(
            "recall"
        ),
    )


SEM_K_SCALED = 32  # the k-scales-with-n variant's cluster count

_SEMDEDUP_K32_SQL = (
    _sem_kmeans_chain(SEM_K_SCALED)
    + ","
    + _SEM_PAIRS_CTE
    + """,
    dups AS (
      SELECT v2 AS vec_id, MIN(v1) AS dup_of, COUNT(*) AS n_sim
      FROM simpairs GROUP BY v2
    )
    SELECT a.vec_id, a.cid AS cluster,
           d.vec_id IS NULL AS keep,
           COALESCE(d.dup_of, -1) AS dup_of,
           COALESCE(d.n_sim, 0) AS n_sim
    FROM a2 a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""
)


@query("dedup_semantic_k32", oracle=_SEMDEDUP_K32_SQL)
def dedup_semantic_k32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_semantic with the k-SCALES-WITH-n mitigation applied
    (k=32 vs the baseline's 8): same Lloyd machinery, same pruning
    rule, 4x more clusters — so within-cluster candidate volume
    (sum of cluster sizes squared) drops ~4x, which is EXACTLY the
    knob the baseline's 10x-scale row says production uses
    (k ~ n / target_cluster_size keeps per-cluster cost constant).
    Benchmarked next to the k=8 baseline at both scales so the
    mitigation is measured, not asserted. Oracle unrolls the full
    32-seed chain."""
    assign = _sem_assign(spark, sf_dir, k=SEM_K_SCALED)
    dups = (
        _sem_pairs(assign)
        .groupBy(F.col("v2").alias("vec_id"))
        .agg(F.min("v1").alias("dup_of"), F.count("*").alias("n_sim"))
    )
    return (
        assign.select("vec_id", F.col("cid").alias("cluster"))
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).alias("dup_of"),
            F.coalesce(F.col("n_sim"), F.lit(0)).alias("n_sim"),
        )
    )
