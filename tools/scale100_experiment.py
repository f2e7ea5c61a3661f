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

# --knn (VERDICT r10 next #6): the trained-IVF kNN family on the FRESH
# 100× vectors — time ratios AND recall-at-scale (the r8 embeddings
# axis predates the trained join; the √N-cells/log-probes claims were
# measured only at 10×)
KNN_QUERIES = ["ann_knn_join_ivf", "ann_knn_classify"]


def panel_recall(spark, sf_dir: str, panel_mod: int) -> dict:
    """Mean recall@K_JOIN of the trained-IVF kNN join against an exact
    panel truth (every ``panel_mod``-th vector), at corpora where the
    full quadratic truth is impossible: the panel×corpus scoring runs
    as the recall query's blocked Arrow kernel (sequential-dim fold,
    HALF_UP rounding), so panel truth stays exact while costing
    |panel|·N instead of N². Driver holds |panel|·dim doubles."""
    import numpy as np

    from kinesis_s3_spark.operators.ann import K_JOIN, _knn_join_ivf
    from kinesis_s3_spark.operators.embeddings import kmeans_vv

    emb = load_table(spark, sf_dir, "embeddings")
    panel_rows = (
        emb.filter(F.col("vec_id") % panel_mod == 0).select("vec_id", "embedding").collect()
    )
    panel = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in panel_rows]

    def gen(batches):
        import pandas as pd

        P = np.asarray([v for _, v in panel], dtype=np.float64)
        pids = np.asarray([i for i, _ in panel], dtype=np.int64)
        pn = np.zeros(len(pids))
        for j in range(P.shape[1]):
            pn += P[:, j] * P[:, j]
        pn = np.sqrt(pn)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            dids = pdf["vec_id"].to_numpy()
            dot = np.zeros((len(pids), len(B)))
            bn = np.zeros(len(B))
            for j in range(P.shape[1]):
                dot += np.outer(P[:, j], B[:, j])
                bn += B[:, j] * B[:, j]
            cos = dot / np.outer(pn, np.sqrt(bn))
            cos = np.trunc(cos * 1e4 + np.copysign(0.5, cos)) / 1e4
            o_src, o_dst, o_cos = [], [], []
            for i in range(len(pids)):
                order = np.lexsort((dids, -cos[i]))[: K_JOIN + 1]
                kept = 0
                for ix in order:
                    if int(dids[ix]) == int(pids[i]) or kept >= K_JOIN:
                        continue
                    o_src.append(int(pids[i]))
                    o_dst.append(int(dids[ix]))
                    o_cos.append(cos[i, ix])
                    kept += 1
            yield pd.DataFrame({
                "src": np.asarray(o_src, dtype=np.int64),
                "dst": np.asarray(o_dst, dtype=np.int64),
                "cos": np.asarray(o_cos, dtype=np.float64),
            })

    from pyspark.sql import Window

    vv = kmeans_vv(spark, sf_dir)
    batch_top = vv.select("vec_id", "e").mapInPandas(gen, "src long, dst long, cos double")
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), "dst")
    truth = (
        batch_top.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_JOIN)
        .select("src", "dst")
    )
    approx = _knn_join_ivf(spark, sf_dir).select(
        F.col("vec_id").alias("a_src"), F.col("nbr_id").alias("a_dst")
    )
    hits = (
        truth.join(
            approx,
            (truth["src"] == approx["a_src"]) & (truth["dst"] == approx["a_dst"]),
            "left",
        )
        .groupBy("src")
        .agg(F.count("a_dst").alias("n_hit"))
    )
    row = hits.agg(
        F.count("*").alias("n_panel"),
        F.round(F.sum("n_hit").cast("double") / (F.count("*") * K_JOIN), 4).alias("mean"),
    ).collect()[0]
    return {"n_panel": int(row["n_panel"]), "mean_recall": float(row["mean"])}


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


OUT_EV = "/tmp/scale100ev"

EV_QUERIES = [
    "events_sessionize",
    "events_asof_join",
    "events_funnel_steps",
    "events_retention_cohorts",
    "events_drift_ks",
    "join_skew_salted",
]


def build_events(spark) -> None:
    """100× events corpus-growth axis (VERDICT r8 next #3): copy 0 is
    the original sf0.1 tables; the growth is FRESH rows at natural key
    density — 99× more USERS (new user_ids, hash-derived event
    streams at the original ~67 events/user over the same 30-day
    window), not replicas, so sessions/cohorts/funnels grow by user
    count while per-user stream length (the window-partition size)
    stays constant — exactly how a 100 TB product corpus grows.

    Companion tables grow with the users: fresh orders for the new
    users at the original ~10 orders/user (events_asof_join), and a
    99× supplier/lineitem pair at constant lineitems-per-supplier
    (join_skew_salted). Only the columns those queries read are
    generated; everything else symlinks to sf0.1."""
    if os.path.exists(os.path.join(OUT_EV, "_BUILT")):
        return
    import shutil

    shutil.rmtree(OUT_EV, ignore_errors=True)
    os.makedirs(OUT_EV)
    extra = COPIES - 1

    e0 = load_table(spark, BASE, "events")
    n_ev = e0.count()
    n_users = e0.agg(F.max("user_id")).first()[0] + 1
    max_eid = e0.agg(F.max("event_id")).first()[0] + 1
    ts_lo, ts_hi = e0.agg(F.min("ts"), F.max("ts")).first()
    span_s = int((ts_hi - ts_lo).total_seconds())
    types = sorted(r[0] for r in e0.select("event_type").distinct().collect())
    dt = dict(e0.dtypes)

    def h(tag):  # deterministic per-row hash in [0, 2^31)
        return F.pmod(
            F.hash(F.concat(F.col("id").cast("string"), F.lit(tag))).cast("long"),
            F.lit(2**31),
        )

    g = spark.range(extra * n_ev).select(
        (F.col("id") + F.lit(max_eid)).cast(dt["event_id"]).alias("event_id"),
        F.expr(
            f"timestampadd(MICROSECOND, pmod(hash(concat(cast(id as string), '_us')), 1000000), "
            f"timestampadd(SECOND, pmod(hash(concat(cast(id as string), '_t')), {span_s}), "
            f"TIMESTAMP_NTZ '{ts_lo.strftime('%Y-%m-%d %H:%M:%S')}'))"
        ).cast(dt["ts"]).alias("ts"),
        (F.lit(n_users) + (h("_u") % F.lit(extra * n_users)))
        .cast(dt["user_id"]).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in types]), (h("_e") % len(types) + 1).cast("int")
        ).cast(dt["event_type"]).alias("event_type"),
        F.round((h("_v") % 15000) / 100.0, 2).cast(dt["value"]).alias("value"),
        F.format_string('{"k": %d}', (h("_k") % 100).cast("int"))
        .cast(dt["props"]).alias("props"),
    )
    e0.select(*[c for c, _ in e0.dtypes]).unionByName(g).write.parquet(
        f"{OUT_EV}/events.parquet"
    )

    # fresh orders for the NEW users, ~10 orders/user (the original
    # per-custkey density); only the asof-join columns
    o0 = load_table(spark, BASE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    odt = dict(o0.dtypes)
    max_ok = o0.agg(F.max("o_orderkey")).first()[0] + 1
    n_new_orders = extra * n_users * 10
    go = spark.range(n_new_orders).select(
        (F.col("id") + F.lit(max_ok)).cast(odt["o_orderkey"]).alias("o_orderkey"),
        (F.lit(n_users) + (h("_c") % F.lit(extra * n_users)))
        .cast(odt["o_custkey"]).alias("o_custkey"),
        F.date_add(F.lit("1992-01-01").cast("date"), (h("_d") % 2400).cast("int"))
        .cast(odt["o_orderdate"]).alias("o_orderdate"),
    )
    o0.unionByName(go).write.parquet(f"{OUT_EV}/orders.parquet")

    # 99× suppliers + lineitems at constant lineitems-per-supplier
    s0 = load_table(spark, BASE, "supplier").select("s_suppkey", "s_nationkey")
    sdt = dict(s0.dtypes)
    n_sup = s0.count()
    gs = spark.range(extra * n_sup).select(
        (F.col("id") + F.lit(n_sup + 1)).cast(sdt["s_suppkey"]).alias("s_suppkey"),
        (h("_n") % 25).cast(sdt["s_nationkey"]).alias("s_nationkey"),
    )
    s0.unionByName(gs).write.parquet(f"{OUT_EV}/supplier.parquet")

    l0 = load_table(spark, BASE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    ldt = dict(l0.dtypes)
    n_li = l0.count()
    max_lok = l0.agg(F.max("l_orderkey")).first()[0] + 1
    gl = spark.range(extra * n_li).select(
        (F.col("id") + F.lit(max_lok)).cast(ldt["l_orderkey"]).alias("l_orderkey"),
        ((h("_s") % F.lit((extra + 1) * n_sup)) + 1)
        .cast(ldt["l_suppkey"]).alias("l_suppkey"),
        F.round((h("_p") % 10_000_000) / 100.0, 2)
        .cast(ldt["l_extendedprice"]).alias("l_extendedprice"),
    )
    l0.unionByName(gl).write.parquet(f"{OUT_EV}/lineitem.parquet")

    for t in ("region", "nation", "customer", "part", "documents", "embeddings"):
        src = os.path.join(BASE, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(OUT_EV, f"{t}.parquet"))
    open(os.path.join(OUT_EV, "_BUILT"), "w").close()


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
    ev_mode = "--events" in names
    knn_mode = "--knn" in names
    names = [a for a in names if not a.startswith("--")]
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    if knn_mode:
        from kinesis_s3_spark.operators.ann import knn_cells, knn_probes

        build_embeddings(spark)
        for name in names or KNN_QUERIES:
            row = {"query": name}
            for sf_dir, col in ((BASE, "sec_1x"), (OUT_EMB, "sec_100x")):
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                row[col] = round(time.time() - t0, 2)
            row["ratio"] = round(row["sec_100x"] / max(row["sec_1x"], 1e-9), 1)
            print(json.dumps(row), flush=True)
        for sf_dir, tag, mod in ((BASE, "1x", 4), (OUT_EMB, "100x", 1000)):
            n = load_table(spark, sf_dir, "embeddings").count()
            t0 = time.time()
            rec = panel_recall(spark, sf_dir, mod)
            print(json.dumps({
                "recall_at_scale": tag, "n": n,
                "cells": knn_cells(n), "probes": knn_probes(n),
                **rec, "sec": round(time.time() - t0, 2),
            }), flush=True)
        return
    if ev_mode:
        build_events(spark)
        for name in names or EV_QUERIES:
            row = {"query": name}
            for sf_dir, col in ((BASE, "sec_1x"), (OUT_EV, "sec_100x")):
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                row[col] = round(time.time() - t0, 2)
            row["ratio"] = round(row["sec_100x"] / row["sec_1x"], 1)
            print(json.dumps(row), flush=True)
        return
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
        # warm-then-measure at BOTH scales (r10: the sparse-text axis
        # wants ratios, not bare 100× seconds — same shape as ev_mode)
        row = {"query": name}
        for sf_dir, col in ((BASE, "sec_1x"), (OUT, "sec_100x")):
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            row[col] = round(time.time() - t0, 2)
        row["ratio"] = round(row["sec_100x"] / max(row["sec_1x"], 1e-9), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
