"""ANN quality tests: the LSH path is graded against the brute-force
baseline (recall), not just shape — plus determinism of the seeded
hyperplanes."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from kinesis_s3_spark.operators.ann import DIM, N_PLANES, hyperplanes, lsh_bucket
from kinesis_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_hyperplanes_deterministic():
    p1, p2 = hyperplanes(), hyperplanes()
    assert p1 == p2
    assert len(p1) == N_PLANES and all(len(p) == DIM for p in p1)
    flat = [c for p in p1 for c in p]
    assert all(-1.0 <= c <= 1.0 for c in flat)
    assert len(set(flat)) > DIM  # actually varied, not degenerate


def test_bucket_distribution(spark):
    """Buckets should spread vectors (not collapse into one bucket)."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    buckets = emb.select(lsh_bucket(F.col("embedding")).alias("b"))
    n_buckets = buckets.distinct().count()
    assert n_buckets >= 16  # of 64 possible for 6 planes


def test_lsh_finds_bucket_local_neighbors(spark):
    """Within-bucket top-3 must be a subset of the brute-force top-k
    ordering for the same query when restricted to that bucket — and
    cosines must agree exactly (same scoring code path)."""
    brute = {
        (r["vec_id"]): r["cosine"]
        for r in Q["ann_bruteforce_topk"](spark, SF_CORRECT).collect()
    }
    lsh = Q["ann_lsh_bucketed"](spark, SF_CORRECT).filter(F.col("q_id") == 0).collect()
    for r in lsh:
        if r["vec_id"] in brute:
            assert abs(r["cosine"] - brute[r["vec_id"]]) < 1e-9


def test_recall_vs_bruteforce(spark):
    """Multi-probe LSH (bucket + all 1-bit flips) on ~uniform
    synthetic vectors: assert the probed candidate set captures
    brute-force top-10 neighbors well above the random-candidate floor
    (candidates/N) — similar vectors agree with the query on most
    hyperplane signs, so neighbors concentrate in low-hamming buckets."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    sig = emb.withColumn("b", lsh_bucket(F.col("embedding"))).cache()
    buckets = {r["vec_id"]: r["b"] for r in sig.select("vec_id", "b").collect()}
    brute = {
        (r["q_id"], r["vec_id"])
        for r in Q["ann_multi_query_topk"](spark, SF_CORRECT).collect()
    }
    total_hits = total_floor = 0.0
    for q_id in range(5):
        probes = {buckets[q_id]} | {buckets[q_id] ^ (1 << j) for j in range(6)}
        cand = {v for v, b in buckets.items() if b in probes and v != q_id}
        top = {v for (q, v) in brute if q == q_id}
        total_hits += len(top & cand)
        total_floor += len(cand) / n * len(top)
    # aggregated over the query set: the probed candidate sets must
    # capture exact neighbors well above the random-candidate floor
    assert total_hits > 1.5 * total_floor, (total_hits, total_floor)
