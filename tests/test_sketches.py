"""Count-Min sketch invariants, beyond the oracle's cell-by-cell
equality: conservation (every row sums to the total word count) and
the one-sided error guarantee (estimate ≥ truth for EVERY word)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kinesis_s3_spark.operators.sketches import (
    CMS_DEPTH,
    _bucket,
    _cms_matrix,
    _word_stream,
)
from tests.conftest import SF_CORRECT


def test_cms_rows_conserve_total(spark):
    total = _word_stream(spark, SF_CORRECT).count()
    rows = (
        _cms_matrix(spark, SF_CORRECT)
        .groupBy("d")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    )
    assert len(rows) == CMS_DEPTH
    assert all(r["s"] == total for r in rows), rows


def test_cms_never_underestimates(spark):
    """est(word) = min over rows of its cell ≥ true count, for every
    distinct word in the corpus (the CMS guarantee)."""
    words = _word_stream(spark, SF_CORRECT)
    truth = words.groupBy("word").agg(F.count("*").alias("true_cnt"))
    cms = _cms_matrix(spark, SF_CORRECT)
    probes = truth.select(
        "word", "true_cnt", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    ).withColumn("bucket", _bucket(F.col("d"), F.col("word")))
    est = (
        probes.join(cms, ["d", "bucket"])
        .groupBy("word", "true_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0


def test_bloom_no_false_negatives(spark):
    """Every true eval-set doc must flag (the Bloom guarantee); the
    false-positive rate among non-eval docs stays under the m/k bound
    with slack."""
    from kinesis_s3_spark.operators.sketches import sketch_bloom_contamination

    rows = sketch_bloom_contamination(spark, SF_CORRECT).collect()
    eval_rows = [r for r in rows if r["in_eval"]]
    assert eval_rows and all(r["flagged"] for r in eval_rows)
    others = [r for r in rows if not r["in_eval"]]
    fp_rate = sum(r["flagged"] for r in others) / len(others)
    assert fp_rate < 0.1, fp_rate


def test_cms_streaming_twin_matches_batch(spark, tmp_path):
    """The sketch is one groupBy — so Structured Streaming maintains it
    incrementally (complete mode) and the result after N micro-batches
    must equal the batch matrix over the same data: sketches merge by
    addition, the 100 TB streaming-ingest story."""
    import pyspark.sql.functions as F

    from kinesis_s3_spark.operators.sketches import CMS_DEPTH, _bucket

    inp = str(tmp_path / "docs")
    chunks = (
        [("alpha beta beta",), ("gamma alpha",)],
        [("beta gamma gamma delta",)],
    )
    for rows in chunks:
        spark.createDataFrame(rows, "text string").coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    def matrix(df):
        words = df.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        ).filter(F.col("word") != "")
        cells = words.select(
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"), "word"
        ).select("d", _bucket(F.col("d"), F.col("word")).alias("bucket"))
        return cells.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))

    static = spark.read.parquet(inp)
    stream = spark.readStream.schema(static.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(inp)
    q = (
        matrix(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in spark.sql("select * from cms_stream").collect()
        }
    finally:
        q.stop()
    want = {(r["d"], r["bucket"]): r["cnt"] for r in matrix(static).collect()}
    assert got == want


def test_mg_survives_partition_layouts(spark):
    """The heavy-hitter output is the EXACT over-threshold set under
    every partition layout (the Misra-Gries pigeonhole guarantee),
    exercised on a genuinely skewed constructed corpus — the parquet
    testdata is near-uniform, so the skew path is proven here."""
    import pyspark.sql.functions as F

    from kinesis_s3_spark.operators.sketches import mg_candidates

    # Zipf-ish: key i appears 2000//(i+1) times, 400 distinct keys
    rows = [(f"k{i:03d}",) for i in range(400) for _ in range(2000 // (i + 1))]
    total = len(rows)
    k = 8
    truth = {
        w: c
        for w, c in __import__("collections").Counter(r[0] for r in rows).items()
        if c * k > total
    }
    assert 0 < len(truth) < 400  # non-degenerate skew
    base = spark.createDataFrame(rows, "word string")
    for parts in (1, 3, 17):
        words = base.repartition(parts)
        cands = mg_candidates(words, k)
        assert cands.count() <= k * parts
        got = {
            r["word"]: r["freq"]
            for r in words.join(F.broadcast(cands), "word")
            .groupBy("word")
            .agg(F.count("*").alias("freq"))
            .filter(F.col("freq") * k > total)
            .collect()
        }
        assert got == truth, (parts, len(got), len(truth))


def test_quantile_histogram_bound_holds(spark):
    """Every estimated quantile sits within one bin width ABOVE the
    exact rank value (the right-edge one-sided guarantee)."""
    from kinesis_s3_spark.operators.sketches import sketch_quantile_histogram

    rows = sketch_quantile_histogram(spark, SF_CORRECT).collect()
    assert len(rows) == 5
    assert all(r["within_bin"] for r in rows), rows
    assert all(r["err"] >= 0 for r in rows), rows


def test_ams_f2_unbiased_shape(spark):
    """AMS invariants on the gate data: the exact F2 equals the
    sum of squared key counts; the estimator is positive; and on a
    CONSTRUCTED fully-skewed key (all rows one key) the sketch is
    EXACT — every estimator's Z is ±n, so mean(Z²) = n² = F2."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod

    row = entrymod.queries()["sketch_ams_f2"](spark, SF_CORRECT).collect()[0]
    assert row["f2_est"] > 0
    assert row["f2_exact"] >= row["n"]  # equality iff all keys distinct
    assert row["skew_ratio"] >= 1.0 - 1e-9  # Cauchy-Schwarz lower bound

    from kinesis_s3_spark.operators.sketches import AMS_ESTIMATORS

    one_key = spark.createDataFrame([("u",)] * 100, "user_id string")
    j = F.explode(F.sequence(F.lit(0), F.lit(AMS_ESTIMATORS - 1))).alias("j")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("j").cast("string"), F.col("user_id"))), 1, 15
        ),
        16,
        10,
    )
    z = (
        one_key.select(j, "user_id")
        .select("j", (2 * (h.cast("long") % 2) - 1).alias("s"))
        .groupBy("j")
        .agg(F.sum("s").alias("z"))
        .collect()
    )
    assert all(abs(r["z"]) == 100 for r in z)


def test_hll_registers_merge_by_max(spark):
    """The mergeability contract the register table exists for:
    registers built over two disjoint halves, merged by pairwise MAX,
    equal the whole-corpus registers — so per-shard/per-day sketches
    OR together losslessly."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.operators.sketches import sketch_hll_registers
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    whole = {
        r["bucket"]: r["reg"] for r in sketch_hll_registers(spark, sf).collect()
    }

    o = load_table(spark, sf, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll|"), F.col("o_custkey").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    halves = [
        o.filter(F.col("o_orderkey") % 2 == i).select(h.alias("hv")).distinct()
        for i in (0, 1)
    ]
    merged: dict[int, int] = {}
    for half in halves:
        br = half.select(
            F.floor(F.col("hv") / (1 << 54)).cast("long").alias("bucket"),
            (F.col("hv") % (1 << 54)).alias("suffix"),
        )
        rank = F.least(
            F.when(F.col("suffix") == 0, F.lit(55)).otherwise(
                F.lit(55) - F.length(F.bin(F.col("suffix")))
            ),
            F.lit(48),
        )
        for r in br.select("bucket", rank.alias("rank")).groupBy("bucket").agg(
            F.max("rank").alias("reg")
        ).collect():
            merged[r["bucket"]] = max(merged.get(r["bucket"], 0), r["reg"])
    assert merged == whole


def test_hll_estimate_within_bound(spark):
    from kinesis_s3_spark.operators.sketches import sketch_hll_estimate

    row = sketch_hll_estimate(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["within_3_sigma"]
    assert row["rel_err"] <= 3 * 1.04 / 8  # m=64 -> sigma = 13%


def test_kmv_intersection_reasonable_and_consistent(spark):
    """Jaccard/intersection from sketches alone: estimates live in
    valid ranges, the identity inter = jaccard * union holds by
    construction, and the realized error stays within the loose
    k=256 band the estimator theory gives."""
    from kinesis_s3_spark.operators.sketches import sketch_kmv_intersection

    r = sketch_kmv_intersection(spark, "/root/testdata/sf0.01").collect()[0]
    assert 0.0 <= r["jaccard_est"] <= 1.0
    assert r["union_est"] > 0 and r["exact_inter"] > 0
    assert abs(r["inter_est"] - r["jaccard_est"] * r["union_est"]) < 1e-3
    assert r["rel_err_inter"] < 0.5  # loose sanity band, not the gate
