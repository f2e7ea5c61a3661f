"""SemDeDup (cluster-blocked semantic dedup) quality tests: verdict
consistency, twin coverage gated against the planted ground truth, and
agreement with the strict-LSH pair mechanism on the shared corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from kinesis_s3_spark.operators.ann import PLANT_N, PLANT_OFFSET
from kinesis_s3_spark.operators.semdedup import SEM_K, SEM_THRESHOLD
from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_semdedup_verdicts_consistent(spark):
    rows = Q["dedup_semantic"](spark, SF_CORRECT).collect()
    by_id = {r["vec_id"]: r for r in rows}
    # one verdict per augmented vector (corpus + planted twins)
    assert len(rows) == len(by_id)
    assert sum(1 for r in rows if r["vec_id"] >= PLANT_OFFSET) == PLANT_N
    for r in rows:
        assert 0 <= r["cluster"] < SEM_K
        if r["keep"]:
            assert r["dup_of"] == -1 and r["n_sim"] == 0
        else:
            # dup_of is a real lower-id vector in the SAME cluster
            assert r["dup_of"] in by_id and r["dup_of"] < r["vec_id"]
            assert by_id[r["dup_of"]]["cluster"] == r["cluster"]
            assert r["n_sim"] >= 1


def test_semdedup_recall_gate(spark):
    """Cluster blocking must catch >= 90% of the planted twins (each
    twin pair has cosine ~0.9996 >> threshold, so a miss can only be a
    cluster-boundary split — the mechanism's one failure mode)."""
    r = Q["dedup_semantic_recall"](spark, SF_CORRECT).collect()[0]
    assert r["n_true"] == PLANT_N
    assert r["recall"] >= 0.9, r


def test_semdedup_drops_are_twin_shaped(spark):
    """On this corpus every drop should pair a twin with its original:
    no natural pair reaches the 0.85 threshold (corpus max ~0.51)."""
    dropped = (
        Q["dedup_semantic"](spark, SF_CORRECT)
        .filter(~F.col("keep"))
        .collect()
    )
    assert dropped, "planted twins must produce drops"
    for r in dropped:
        assert r["vec_id"] >= PLANT_OFFSET
        assert r["dup_of"] == r["vec_id"] - PLANT_OFFSET
    assert SEM_THRESHOLD == 0.85  # drop-shape argument relies on it


def test_span_dedup_flags_exact_duplicates(spark):
    """Documents that are exact duplicates of another (dedup_exact's
    ground truth) must show 100% span coverage; the signal must also
    be non-trivial (some but not all docs carry duplicated spans)."""
    rows = Q["dedup_span_exact"](spark, SF_CORRECT).collect()
    by_id = {r["doc_id"]: r for r in rows}
    flagged = [r for r in rows if r["n_dup_spans"] > 0]
    assert 0 < len(flagged) < len(rows)
    # cross-check vs whole-doc exact dedup: every doc in a >=2 exact
    # group has every span duplicated
    exact = Q["dedup_exact"](spark, SF_CORRECT).collect()
    from collections import Counter

    sizes = Counter(r["content_hash"] for r in exact)
    for r in exact:
        if sizes[r["content_hash"]] >= 2 and r["doc_id"] in by_id:
            assert by_id[r["doc_id"]]["dup_frac"] == 1.0, r["doc_id"]


def test_hybrid_rrf_fuses_both_arms(spark):
    """The fused top-10 must contain members of both arms, rank by
    descending RRF score with doc_id tie-break, and score docs present
    in both arms above equal-rank single-arm docs."""
    rows = Q["search_hybrid_rrf"](spark, SF_CORRECT).collect()
    assert len(rows) == 10
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [(-r["rrf_score"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)
    assert any(r["bm25_rank"] > 0 for r in rows)
    assert any(r["ann_rank"] > 0 for r in rows)
    for r in rows:
        expected = 0.0
        if r["bm25_rank"] > 0:
            expected += 1.0 / (60 + r["bm25_rank"])
        if r["ann_rank"] > 0:
            expected += 1.0 / (60 + r["ann_rank"])
        assert abs(r["rrf_score"] - round(expected, 6)) < 1e-9, r


def test_hier_verdicts_consistent_and_recall(spark):
    """Hierarchical blocking (coarse x fine cells, k ∝ n): verdicts
    follow the dedup_semantic rules, and two-level blocking must still
    catch >= 85% of the planted twins (each level adds one
    cell-boundary split opportunity — the cost the n·2√k assign buys;
    measured so the trade is visible, not asserted)."""
    rows = Q["dedup_semantic_hier"](spark, SF_CORRECT).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert len(rows) == len(by_id)
    assert sum(1 for r in rows if r["vec_id"] >= PLANT_OFFSET) == PLANT_N
    for r in rows:
        if r["keep"]:
            assert r["dup_of"] == -1 and r["n_sim"] == 0
        else:
            d = by_id[r["dup_of"]]
            assert r["dup_of"] < r["vec_id"]
            assert (d["coarse"], d["fine"]) == (r["coarse"], r["fine"])
            assert r["n_sim"] >= 1
    caught = sum(
        1
        for r in rows
        if r["vec_id"] >= PLANT_OFFSET
        and not r["keep"]
        and r["dup_of"] == r["vec_id"] - PLANT_OFFSET
    )
    assert caught / PLANT_N >= 0.85, caught


def test_block_pairs_chunked_matches_single_task(spark):
    """r13 sub-blocking parity: forcing C > 1 chunks per cluster (tiny
    chunk_target) must emit EXACTLY the single-task-per-cluster pair
    set — same (v1, v2) rows, same count — on the real sf0.001 corpus
    assignment."""
    from kinesis_s3_spark.operators.semdedup import (
        _block_pairs_arrow,
        _sem_assign,
    )
    from tests.conftest import SF_SMOKE

    assign = _sem_assign(spark, SF_SMOKE)
    single = _block_pairs_arrow(assign, ["cid"]).collect()
    chunked = _block_pairs_arrow(
        assign, ["cid"], n_blocks=8, chunk_target=8
    ).collect()
    key = lambda r: (r["v1"], r["v2"])  # noqa: E731
    assert sorted(map(key, chunked)) == sorted(map(key, single))
    assert len(single) > 0
