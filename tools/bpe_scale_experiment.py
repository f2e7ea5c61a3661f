"""Measure BPE training at a production merge budget (VERDICT r5
task #6): run the batched trainer to >=1000 merges over the documents
corpus and report wall-time, rounds, Spark jobs, and jobs-per-merge —
the evidence that the batched loop's driver-round-trip economics hold
at real vocabulary scale, not just at the gated k64 budget.

Usage: python tools/bpe_scale_experiment.py [sf_dir] [n_merges]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_s3_spark.session import get_spark  # noqa: E402
from kinesis_s3_spark.operators.bpe import train_bpe_batched  # noqa: E402
from kinesis_s3_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    accept, window = 32, 128  # k64's 16/64 shape scaled 2x
    # generous round budget: late rounds accept fewer than the cap as
    # the window runs short of disjoint candidates; target_merges stops
    # the loop the moment the budget is reached
    rounds = 4 * ((target + accept - 1) // accept)

    spark = get_spark("bpe-1k")
    spark.sparkContext.setLogLevel("ERROR")
    # The synthetic documents table has only 31 distinct words — the
    # whole corpus saturates at ~82 merges. To exercise a 1k-merge
    # budget we derive a high-vocabulary corpus from the SAME data:
    # each word-trigram becomes one underscore-joined pseudo-word
    # (27k distinct at sf0.1), and the trainer sees it as an ordinary
    # (doc_id, text) frame. Same trainer, same code path, real scale.
    from pyspark.sql import functions as F

    raw = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = raw.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
                lambda i: F.concat_ws(
                    "_",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            ),
            " ",
        ).alias("text"),
    )

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    t0 = time.time()
    merges = train_bpe_batched(
        docs, n_rounds=rounds, accept_cap=accept, window=window, target_merges=target
    )
    wall = time.time() - t0
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    n_jobs = jobs_after - jobs_before

    # invariants a correct merge table must satisfy at any budget
    pairs = [(l, r) for _rank, l, r, _c in merges]
    assert len(set(pairs)) == len(pairs), "duplicate merge learned"
    symbols = {s for l, r in pairs for s in (l, r, l + r)}

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_merges": len(merges),
                "rounds": rounds,
                "accept_cap": accept,
                "window": window,
                "wall_sec": round(wall, 2),
                "spark_jobs": n_jobs,
                "jobs_per_merge": round(n_jobs / max(1, len(merges)), 4),
                "sec_per_merge": round(wall / max(1, len(merges)), 4),
                "vocab_symbols": len(symbols),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
