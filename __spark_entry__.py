"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions for the DuckDB oracle
correctness gate. The registry itself lives in
``kinesis_s3_spark.operators.registry`` — operator modules register via
the @query decorator at import time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the registry; queries() then
# re-orders entries by _GATE_FIRST below, so import order no longer
# determines driver-gate coverage.
from kinesis_s3_spark.operators.registry import ORACLES, QUERIES  # noqa: E402

_OPTIONAL_MODULES = (
    "kinesis_s3_spark.operators.dedup",
    "kinesis_s3_spark.operators.ann",
    "kinesis_s3_spark.operators.etl",
    "kinesis_s3_spark.operators.enriched",
    "kinesis_s3_spark.operators.text",
    "kinesis_s3_spark.operators.curation",
    "kinesis_s3_spark.operators.embeddings",
    "kinesis_s3_spark.operators.multimodal",
    "kinesis_s3_spark.operators.chunking",
    "kinesis_s3_spark.operators.tpch_extra",
    "kinesis_s3_spark.operators.tpch_correlated",
    "kinesis_s3_spark.operators.bpe",
    "kinesis_s3_spark.operators.search",
    "kinesis_s3_spark.operators.semdedup",
    "kinesis_s3_spark.operators.dsir",
    "kinesis_s3_spark.operators.quality_lr",
    "kinesis_s3_spark.operators.layout",
    "kinesis_s3_spark.operators.sampling",
    "kinesis_s3_spark.operators.graph",
    "kinesis_s3_spark.operators.sketches",
    "kinesis_s3_spark.operators.misc",
    "kinesis_s3_spark.operators.urls",
    "kinesis_s3_spark.operators.approx",
    "kinesis_s3_spark.operators.events",
    "kinesis_s3_spark.operators.scalar",
    "kinesis_s3_spark.operators.relational",
)
for _m in _OPTIONAL_MODULES:
    try:
        __import__(_m)
    except ImportError:
        pass

# The driver's correctness gate historically checks the FIRST ~50
# registry entries, so gate slots are scarce. Rotation policy (VERDICT
# r5 task #5): oldest-green-first. Band 0 holds queries whose
# internals changed THIS round (the r13 optimization surface: the
# Lloyd mean-update revert's 16 trainer consumers, the chunked
# semdedup pair kernel, the ADC emit prune, the LPA round collapse,
# the DSIR totals derivation); band 1 holds the r12 rewrites the
# rotating r12 sample missed (VERDICT r12 next #7 — q21's window
# decorrelation, q5's join reorder, the gram-window family, RAKE,
# CUSUM, epoch shuffle, the LSH verify kernels, simhash's early
# filter, the resolver/survivorship fusions); the remaining slots take
# the stalest block (last green in round 7), ordered by most-recent
# green driver-gate row ascending from CORRECTNESS_r01..r12.json.
_GATE_FIRST = [
    # -- (0) internals changed in round 13, must re-gate --
    "dedup_semantic",
    "dedup_semantic_k32",
    "dedup_semantic_recall",
    "dedup_semantic_hier",
    "ann_knn_join_ivf",
    "ann_recall_knn_join",
    "ann_knn_join_pq",
    "ann_recall_knn_join_pq",
    "ann_knn_classify",
    "emb_kmeans",
    "ann_ivf_kmeans_topk",
    "ann_recall_ivf_kmeans",
    "ann_pq_topk",
    "ann_recall_pq",
    "graph_label_propagation",
    "graph_link_prediction",
    "curation_dsir_weights",
    # -- (1) rewritten in round 12, never driver-gated since --
    "q21_waiting_suppliers",
    "q5_region_revenue",
    "text_rake_keywords",
    "dedup_ngram_coverage",
    "dedup_span_exact",
    "text_ngram_novelty",
    "events_cusum_alarm",
    "curation_epoch_shuffle",
    "events_mad_outliers",
    "curation_split_leakage",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_strict",
    "dedup_recall_embedding_lsh",
    "emb_kcenter_batched",
    "dedup_simhash_pairs",
    "dedup_cluster_resolve",
    "curation_dedup_survivorship",
    "emb_power_iteration",
    # -- (2) stalest block: last driver-gated in round 7 --
    "ann_recall_mips_ivf",
    "curation_decontaminate",
    "curation_dedup_pipeline",
    "curation_epoch_shuffle_write",
    "curation_quality_lr_calibration",
    "emb_prototype_prune",
    "events_funnel_conversion_time",
    "events_peak_detection",
    "events_resample_ffill",
    "events_rollup_cascade",
    "events_seasonal_decompose",
    "fn_string_suite",
    "join_anti",
    "join_argmin_supplier",
    "join_broadcast_dims",
]



def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``kinesis_s3_spark`` importable on Python workers no matter
    what cwd the driver process runs from.

    Module-level Pandas UDFs (ann.py, multimodal/codecs.py) are
    cloudpickled BY REFERENCE, so the worker re-imports the package;
    workers only inherit the repo on sys.path when the driver happens
    to run from /root/repo. The cluster-correct fix is the same thing
    spark-submit --py-files does: ship a zip of the package once per
    SparkContext via addPyFile (workers prepend it to sys.path at task
    launch). Idempotent and cheap (~100 kB zip, built once)."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "kinesis_s3_spark_pyfiles.zip")
    pkg = os.path.join(_REPO_DIR, "kinesis_s3_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def _shipped(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return wrapper


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _ship_package(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _shipped(v) for k, v in _ordered(QUERIES).items()}


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
