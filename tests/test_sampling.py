"""Weighted-sample tests: the exponential-key sample must actually be
length-biased, deterministic, and without replacement."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from kinesis_s3_spark.operators.sampling import SAMPLE_K
from kinesis_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_weighted_sample_is_length_biased(spark):
    """Mean length of the sample must sit between the plain corpus
    mean and the size-biased mean E[w^2]/E[w] — the theoretical
    expectation for weight-proportional sampling (with slack for a
    k=50 draw). A uniform sampler would straddle the corpus mean
    instead."""
    sample = Q["curation_weighted_sample"](spark, SF_CORRECT)
    mean_sample = sample.agg(F.avg("n_chars")).collect()[0][0]
    stats = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(
            F.avg("n_chars").alias("mean"),
            (
                F.sum(F.col("n_chars") * F.col("n_chars"))
                / F.sum("n_chars")
            ).alias("size_biased_mean"),
        )
        .collect()[0]
    )
    # strictly above the uniform expectation, by at least a third of
    # the uniform -> size-biased gap; and not absurdly above it
    gap = stats["size_biased_mean"] - stats["mean"]
    assert gap > 0
    assert mean_sample > stats["mean"] + gap / 3, (mean_sample, dict(stats.asDict()))
    assert mean_sample < stats["size_biased_mean"] + gap, (mean_sample, dict(stats.asDict()))


def test_weighted_sample_deterministic_and_distinct(spark):
    a = Q["curation_weighted_sample"](spark, SF_CORRECT).collect()
    b = Q["curation_weighted_sample"](spark, SF_CORRECT).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == SAMPLE_K
    assert len({r["doc_id"] for r in a}) == SAMPLE_K  # without replacement
    keys = [(r["es_key"], r["doc_id"]) for r in sorted(a, key=lambda r: r["rank"])]
    assert keys == sorted(keys)
