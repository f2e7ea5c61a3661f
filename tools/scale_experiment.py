"""Scale experiment: replicate sf0.1 10× (≈ sf1: 6M lineitem rows,
150k orders... ×10) into /tmp and measure headline queries at both
scales. The point is the SHAPE of the scaling curve: linear (scan/agg
bound) operators should scale ≈10×, sub-linear ones (top-k, broadcast
join with fixed dim side) less — evidence that the plans survive
scale-up, recorded in SCALE.md.

Usage: python tools/scale_experiment.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from kinesis_s3_spark.session import get_spark
from kinesis_s3_spark.sources.tables import TABLES, load_table

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale10"
COPIES = 10
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "agg_distinct",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_cluster_resolve",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "events_asof_join",
    "text_vocabulary",
    "text_gopher_repetition",
    "curation_pack_sequences",
    "emb_normalize_quantize",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "events_retention_cohorts",
    "text_unigram_surprisal",
    "events_zscore_anomaly",
    "dedup_embedding_lsh",
    "emb_kmeans",
    "text_tfidf_topk",
    "events_ewma",
    "join_skew_salted",
    "text_bigram_surprisal",
]

KEY_OFFSETS = {
    # key columns that must stay consistent across replicated tables
    "lineitem": {"l_orderkey": 10**10},
    "orders": {"o_orderkey": 10**10},
    "events": {"event_id": 10**10},
    "documents": {"doc_id": 10**10},
    "embeddings": {"vec_id": 10**10},
}


def replicate(spark) -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for name in TABLES:
        df = load_table(spark, BASE, name)
        if name in ("region", "nation", "customer", "supplier", "part"):
            df.write.parquet(f"{OUT}/{name}.parquet")  # dims unchanged
            continue
        parts = []
        for i in range(COPIES):
            c = df
            for col, step in KEY_OFFSETS.get(name, {}).items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.parquet(f"{OUT}/{name}.parquet")


def run(spark, sf_dir: str) -> dict[str, float]:
    q = entrymod.queries()
    times = {}
    for name in QUERIES:
        # time CONSTRUCTION + materialization: iterative operators
        # (dedup_cluster_resolve) execute jobs while building the frame,
        # so timing only the final write would undercount them
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 2)
    return times


def main() -> None:
    # --only q1,q2: measure a subset; --no-replicate: reuse /tmp/scale10
    global QUERIES
    args = sys.argv[1:]
    if "--only" in args:
        QUERIES = args[args.index("--only") + 1].split(",")
    spark = get_spark("scale-exp")
    spark.sparkContext.setLogLevel("ERROR")
    if "--no-replicate" not in args or not os.path.isdir(OUT):
        replicate(spark)
    small = run(spark, BASE)
    big = run(spark, OUT)
    report = {
        name: {
            "sf0.1_sec": small[name],
            "sf1_sec": big[name],
            "scale_factor": round(big[name] / max(small[name], 1e-9), 1),
        }
        for name in QUERIES
    }
    print(json.dumps(report, indent=2))
    with open("/tmp/scale_report.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
