"""Greedy vs batched k-center crossover (VERDICT r8 next #6).

emb_kcenter_coreset folds ONE center literal per greedy round — k
scans and a k-term LEAST projection, fine at k=8, impossible at
k=10^4. emb_kcenter_batched replaces the per-pick scans with PASSES
top-ℓ oversampling scans + a driver-side re-greedy on the collected
candidates (k-means|| shape). This measures where the one-pick greedy
stops and the batched form wins, AND the coverage-quality price: both
arms report the realized corpus coverage radius of their selected set,
so the speedup is never quoted without the radius delta next to it.

Self-contained (spark.range synthetic unit-ish vectors, deterministic
hash-derived), batched uses passes = ceil(k / ℓ) with ℓ = 8 so the
candidate pool is ~2k as in k-means|| practice.

Run:  python tools/kcenter_scale_experiment.py [n] [k1 k2 ...]
Default: n=200_000, k in 8, 32, 128. Results land in SCALE.md by hand.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_s3_spark.operators.embeddings import (
    _dot,
    _kc_dist,
    kcenter_batched_frame,
    kcenter_greedy_frame,
)
from kinesis_s3_spark.session import get_spark

DIM = 32


def synth(spark, n: int):
    """(vec_id, e) with hash-derived coordinates in [-1, 1]."""
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(
                F.hash(F.concat(F.col("vec_id"), F.lit("_"), j)).cast("long"),
                F.lit(20001),
            )
            - 10000
        ).cast("double")
        / 10000.0,
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), raw.alias("e"))


def corpus_radius(vv, picks_df) -> float:
    """max over corpus of min rounded distance to the selected set —
    computed the same way for both arms so radii are comparable."""
    centers = [
        [float(x) for x in r["e"]]
        for r in vv.join(
            picks_df.select("vec_id"), "vec_id"
        ).select("e").collect()
    ]
    m = None
    for c in centers:
        t = _kc_dist(F.col("e"), c)
        m = t if m is None else F.least(m, t)
    return float(vv.select(m.alias("m")).agg(F.max("m")).collect()[0][0])


def main(n: int, ks: list[int]) -> None:
    spark = get_spark("kcenter-scale")
    spark.sparkContext.setLogLevel("ERROR")
    vv = synth(spark, n).localCheckpoint()
    for k in ks:
        t0 = time.time()
        g = kcenter_greedy_frame(spark, vv, k)
        g_rows = g.collect()
        t_greedy = round(time.time() - t0, 2)
        rg = corpus_radius(vv, g)

        ell = 8
        passes = max(2, math.ceil(2 * k / ell / 2))  # candidate pool ≈ 2k
        t0 = time.time()
        b = kcenter_batched_frame(spark, vv, k=k, l=ell, passes=passes)
        b_rows = b.collect()
        t_batched = round(time.time() - t0, 2)
        rb = b_rows[0]["corpus_radius"]

        print(
            json.dumps(
                {
                    "n": n,
                    "k": k,
                    "greedy_sec": t_greedy,
                    "greedy_radius": round(rg, 4),
                    "batched_sec": t_batched,
                    "batched_passes": passes,
                    "batched_radius": round(rb, 4),
                    "radius_ratio": round(rb / rg, 3) if rg else None,
                }
            ),
            flush=True,
        )
        assert len(g_rows) == k and len(b_rows) == k


if __name__ == "__main__":
    args = sys.argv[1:]
    n = int(float(args[0])) if args else 200_000
    ks = [int(a) for a in args[1:]] or [8, 32, 128]
    main(n, ks)
