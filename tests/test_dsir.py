"""DSIR importance-weight tests: the log-likelihood-ratio signal must
actually separate the target language from the rest, and the output
must be a complete, consistently-ranked resampling order."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from kinesis_s3_spark.operators.dsir import DSIR_TARGET_LANG
from kinesis_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_dsir_separates_target_language(spark):
    """Mean log-ratio of target-language docs must exceed every other
    language's mean — the whole point of the importance weights."""
    w = Q["curation_dsir_weights"](spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents").select("doc_id", "lang")
    means = {
        r["lang"]: r["m"]
        for r in w.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.avg("log_ratio").alias("m"))
        .collect()
    }
    target = means.pop(DSIR_TARGET_LANG)
    assert target > 0, means
    for lang, m in means.items():
        assert m < target, (lang, m, target)


def test_dsir_output_complete_and_ranked(spark):
    rows = Q["curation_dsir_weights"](spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert len(rows) == n_docs
    assert sorted(r["rank"] for r in rows) == list(range(1, n_docs + 1))
    # rank order is exactly (log_ratio desc, doc_id asc)
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [(-r["log_ratio"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)
    for r in rows:
        if r["n_bigrams"] == 0:
            assert r["log_ratio"] == 0.0
