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


def main(names: list[str]) -> None:
    spark = get_spark("scale100")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    for name in names:
        q[name](spark, OUT).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        q[name](spark, OUT).write.format("noop").mode("overwrite").save()
        print(json.dumps({"query": name, "sec_100x": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_QUERIES)
