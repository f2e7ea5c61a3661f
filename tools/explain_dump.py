"""Capture .explain("formatted") for registry queries into files.

The r12 optimization deliverable: plans/r12/<query>_{before,after}.txt
are committed so plan-shape claims in OPTIMIZATION_r12.md are checkable
without running Spark.

Usage:
  python tools/explain_dump.py SUFFIX q1,q2,...   [SF_DIR]
writes plans/r12/<q>_<SUFFIX>.txt for each query (SF_DIR default sf0.1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from kinesis_s3_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    for name in names:
        df = q[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(path)


if __name__ == "__main__":
    main()
