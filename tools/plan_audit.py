"""Registry-wide physical-plan audit: every queries() entry is built
at sf0.001 and its executed plan scanned for scale red flags:

- CartesianProduct / BroadcastNestedLoopJoin with non-broadcast-tiny
  inputs (quadratic blow-up),
- BatchEvalPython (row-at-a-time Python UDF — the forbidden slow path;
  ArrowEvalPython / MapInPandas are the allowed vectorized forms),
- exchange count (shuffle pressure outliers).

tests/test_plans.py asserts the named contracts per-run; this tool is
the breadth sweep to catch a bad plan in ANY registered operator.

Usage: python tools/plan_audit.py  → one JSON line per query + summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kinesis_s3_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")

# by-design exceptions, each justified where it's defined
ALLOW_NESTED_LOOP = {
    "ann_bruteforce_topk",  # broadcast 1-row query side (ann.py)
    "ann_multi_query_topk",  # broadcast 5-row query side
    "ann_ivf_topk",  # broadcast 16-centroid side
    "ann_recall_ivf",
    "ann_recall_ivf_kmeans",  # same brute-force truth side as ann_recall_ivf
    "ann_recall_lsh",
    "dedup_embedding_cosine",  # guarded sf-scale oracle anchor
    "dedup_recall_embedding_lsh",  # runs the guarded anchor as truth
    "dedup_ngram_jaccard",  # guarded within-block verify
    "emb_kmeans",  # centroid-literal explode, no join input
    "join_range_bands",  # banded range join, bounded bands
    "text_unigram_surprisal",  # broadcast 1-row total
    "text_tfidf_topk",  # broadcast 1-row n_docs
    "join_self_correlation",  # bounded self-join on keys
    "q11_important_parts",  # scalar subquery (1-row threshold broadcast)
    "q22_global_balance",  # scalar subquery (1-row avg-balance broadcast)
}


def audit() -> int:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # guarded ops may refuse; not a plan defect
            print(json.dumps({"query": name, "skipped": str(e)[:80]}))
            continue
        row = {
            "query": name,
            "cartesian": plan.count("CartesianProduct"),
            "nested_loop": plan.count("BroadcastNestedLoopJoin"),
            "row_python": plan.count("BatchEvalPython"),
            "arrow_python": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
            "exchanges": plan.count("Exchange"),
        }
        flags = []
        if row["row_python"]:
            flags.append("ROW_PYTHON_UDF")
        if (row["cartesian"] or row["nested_loop"]) and name not in ALLOW_NESTED_LOOP:
            flags.append("UNEXPECTED_CARTESIAN")
        if flags:
            row["flags"] = flags
            bad.append(name)
        print(json.dumps(row))
    print(json.dumps({"summary": {"audited": True, "flagged": bad}}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(audit())
