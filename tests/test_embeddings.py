"""Embedding utility operators: invariants beyond the oracle gate."""

from __future__ import annotations

from kinesis_s3_spark.operators.embeddings import (
    emb_label_centroids,
    emb_normalize_quantize,
)
from tests.conftest import SF_SMOKE


def test_quantize_norm_and_digest(spark):
    rows = emb_normalize_quantize(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.5 < r["l2_norm"] < 2.0  # corpus vectors are ~unit norm
        assert 0 < r["max_abs"] <= 1.0
        assert len(r["q_digest"]) == 32
    # deterministic across runs
    again = {r["vec_id"]: r["q_digest"] for r in emb_normalize_quantize(spark, SF_SMOKE).collect()}
    assert {r["vec_id"]: r["q_digest"] for r in rows} == again


def test_label_centroids_shape(spark):
    rows = emb_label_centroids(spark, SF_SMOKE).collect()
    labels = {r["label"] for r in rows}
    # every (label, pos) cell present exactly once, dim = 64
    assert len(rows) == len(labels) * 64
    n_by_label = {r["label"]: r["n"] for r in rows}
    assert all(n >= 1 for n in n_by_label.values())
    assert all(-1.0 <= r["centroid"] <= 1.0 for r in rows)
