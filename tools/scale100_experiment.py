"""100× documents experiment — one axis past the 10× corpus.

The 10× experiment (tools/scale_experiment.py) replicates documents
VERBATIM, which turns every doc into a 10-way duplicate and measures
dup-density explosion, not corpus growth. This builds a 100×
documents-ONLY corpus where each copy's text is PERTURBED (a unique
copy token appended), so dedup candidates stay at their natural
density and the measurement is the honest "100× more unique data"
axis for the document operators.

Build: 100 copies of sf0.1 documents (5k → 500k docs, ~25M tokens),
doc_id offset per copy; every 7th token is REPLACED by a per-copy
marker, so every 10-token shingle contains at least one copy-specific
token and cross-copy Jaccard is 0 — two weaker perturbations failed
instructively: a trailing copy token left copies at Jaccard ≈ 0.9,
and token ROTATION preserves the cyclic shingle-window set (both
re-measured the C(100,2) pair explosion, 25.9M verified candidate
pairs in 140 s — pair-bound, but not the corpus-growth axis this
experiment wants). Within-copy planted near-dups keep their
similarity (replacements hit the same positions with the same
marker). Run warm-then-measure on document-only queries. Results
land in SCALE.md by hand.

Run:  python tools/scale100_experiment.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_s3_spark.session import get_spark
from kinesis_s3_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale100"
COPIES = 100

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_ngram_novelty",
    "curation_decontaminate",
    "text_unigram_surprisal",
    "curation_epoch_shuffle",
    "text_learnability",
]


def build(spark) -> None:
    if os.path.exists(os.path.join(OUT, "documents.parquet", "_SUCCESS")):
        return
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    docs = load_table(spark, BASE, "documents").withColumn(
        "t", F.split(F.trim("text"), r"\s+")
    )
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(COPIES):
        marked = F.concat_ws(
            " ",
            F.zip_with(
                F.col("t"),
                F.sequence(F.lit(0), F.greatest(F.size("t") - 1, F.lit(0))),
                lambda x, idx: F.when(idx % 7 == 6, F.lit(f"c{i}")).otherwise(x),
            ),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                marked.alias("text"),
                "lang",
                "source",
                (F.length(marked)).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.parquet(f"{OUT}/documents.parquet")


OUT_EMB = "/tmp/scale100emb"

EMB_QUERIES = [
    "ann_ivf_kmeans_topk",
    "ann_mips_ivf_topk",
    "ann_pq_topk",
    "emb_kmeans",
    "dedup_semantic_hier",
]


def build_embeddings(spark) -> None:
    """100× embeddings corpus-growth axis (VERDICT r7 task #4): copy 0
    is the original sf0.1 table; copies 1-99 are FRESH pseudo-random
    unit vectors (hash-derived per (vec_id, dim), then L2-normalized)
    — new data, not replicas, so centroid/bucket occupancy grows at
    natural density instead of duplicate density. Labels keep the
    original cardinality (pmod of the id hash)."""
    if os.path.exists(os.path.join(OUT_EMB, "embeddings.parquet", "_SUCCESS")):
        return
    import shutil

    shutil.rmtree(OUT_EMB, ignore_errors=True)
    os.makedirs(OUT_EMB)
    emb = load_table(spark, BASE, "embeddings")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = emb.select(F.size("embedding")).first()[0]
    nlab = emb.select("label").distinct().count()
    parts = [emb]
    for i in range(1, COPIES):
        ids = spark.range(n).select((F.col("id") + F.lit(i * n)).alias("vec_id"))
        raw = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(
                    F.hash(F.concat(F.col("vec_id"), F.lit("_"), j)).cast("long"),
                    F.lit(20001),
                )
                - 10000
            ).cast("double")
            / 10000.0,
        )
        nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
        parts.append(
            ids.select(
                "vec_id",
                F.transform(raw, lambda x: (x / nrm).cast("float")).alias(
                    "embedding"
                ),
                F.pmod(F.hash(F.col("vec_id")), F.lit(nlab)).cast("int").alias(
                    "label"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.parquet(f"{OUT_EMB}/embeddings.parquet")
    # the five measured queries only read embeddings; symlink the rest
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"):
        src = os.path.join(BASE, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(OUT_EMB, f"{t}.parquet"))


def flat_k_pair_count(spark, sf_dir: str, k: int):
    """The k∝n cliff, measured by COUNT not by evaluation: within-
    cluster candidate pairs Σ|c|·(|c|−1)/2 after a k-cluster Lloyd
    assign — the number the flat-k SemDeDup pair stage would have to
    cosine-evaluate. Cheap (one assign + one agg), so the cliff is
    demonstrated without paying it."""
    from kinesis_s3_spark.operators.semdedup import _sem_assign

    assign = _sem_assign(spark, sf_dir, k=k)
    row = (
        assign.groupBy("cid")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"])


def main(names: list[str]) -> None:
    spark = get_spark("scale100")
    spark.sparkContext.setLogLevel("ERROR")
    emb_mode = "--embeddings" in names
    names = [a for a in names if not a.startswith("--")]
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    if emb_mode:
        build_embeddings(spark)
        for name in names or EMB_QUERIES:
            for sf_dir, col in ((BASE, "sec_1x"), (OUT_EMB, "sec_100x")):
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                print(json.dumps({"query": name, col: round(time.time() - t0, 2)}))
        for sf_dir, tag in ((BASE, "1x"), (OUT_EMB, "100x")):
            t0 = time.time()
            pairs = flat_k_pair_count(spark, sf_dir, k=32)
            print(json.dumps({
                "flat_k32_candidate_pairs": pairs, "scale": tag,
                "assign_sec": round(time.time() - t0, 2),
            }))
        return
    build(spark)
    for name in names or DEFAULT_QUERIES:
        q[name](spark, OUT).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        q[name](spark, OUT).write.format("noop").mode("overwrite").save()
        print(json.dumps({"query": name, "sec_100x": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main(sys.argv[1:])
