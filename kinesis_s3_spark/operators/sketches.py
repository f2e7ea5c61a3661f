"""Distributed sketches (north-star extension; BASELINE.json):
Count-Min — the streaming/heavy-hitter counting sketch a 100 TB
pipeline maintains where exact per-key counts would need a
corpus-sized shuffle.

Spark-first: the d×w counter matrix IS a groupBy — every word
occurrence hashes to (row, bucket) for each of the d rows, and the
matrix is the (row, bucket) count aggregate. Map-side combine means
the shuffle carries at most d·w partials per task regardless of data
size — the sketch's whole point, expressed declaratively with zero
UDFs. Hashes are md5-seeded (registry rule), so the DuckDB oracle
rebuilds the identical matrix and the gate checks it cell by cell —
a DETERMINISTIC sketch, not a probabilistic hope.

The estimate query then serves point lookups (min over rows of the
word's cells) for the exact top-10 words and reports the signed
overestimate vs truth — CMS guarantees est ≥ true, gated in-test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.ranking import global_row_number
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

CMS_DEPTH = 4
CMS_WIDTH = 256

_WORDS_SQL = r"""
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      FROM documents
"""

_CMS_SQL = f"""
    WITH words AS ({_WORDS_SQL}),
    cells AS (
      SELECT d,
             ('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || word), 1, 15))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM words, (SELECT unnest(range(0, {CMS_DEPTH})) AS d)
      WHERE word != ''
    )
    SELECT CAST(d AS INT) AS d, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY d, bucket
"""


def _bucket(d, word) -> F.Column:
    """Row-d bucket for a word — 60 md5 bits mod width, identical to
    the oracle's ('0x' || substr(md5(...), 1, 15))::BIGINT % w."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", d.cast("string"), word)), 1, 15), 16, 10)
    return (h.cast("long") % CMS_WIDTH).cast("int")


def words_of(text_col: F.Column) -> F.Column:
    """The shared tokenization (lower, trim, split on whitespace) —
    one definition for the batch operator AND the streaming
    accumulator so their sketches are mergeable by construction."""
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def _word_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(words_of(F.col("text"))).alias("word")).filter(
        F.col("word") != ""
    )


def cms_cells(words: DataFrame) -> DataFrame:
    """(word) frame → (d, bucket, cnt) Count-Min matrix. Works on any
    word source — the documents corpus here, a micro-batch's payloads
    in streaming/cms.py — because CMS cells from disjoint slices merge
    by addition."""
    cells = words.select(
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"), "word"
    ).select("d", _bucket(F.col("d"), F.col("word")).alias("bucket"))
    return cells.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def _cms_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_cells(_word_stream(spark, sf_dir))


@query("sketch_countmin", oracle=_CMS_SQL)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min counter matrix over corpus words (module
    docstring): d=4 md5-seeded rows × w=256 buckets, one explode +
    one groupBy. Scale: the shuffle carries ≤ d·w partials per task
    (map-side combine); sketches from disjoint partitions merge by
    addition — the same aggregate tree Spark already builds."""
    return _cms_matrix(spark, sf_dir)


@query(
    "sketch_countmin_estimate",
    oracle=f"""
    WITH words AS ({_WORDS_SQL}),
    truth AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM words WHERE word != ''
      GROUP BY word ORDER BY true_cnt DESC, word LIMIT 10
    ),
    cms AS ({_CMS_SQL}),
    lookups AS (
      SELECT t.word, t.true_cnt, c.cnt
      FROM truth t, (SELECT unnest(range(0, {CMS_DEPTH})) AS d) ds
      JOIN cms c
        ON c.d = ds.d
       AND c.bucket = ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || '|' || t.word), 1, 15))::BIGINT
                      % {CMS_WIDTH}
    )
    SELECT word, true_cnt,
           MIN(cnt) AS cms_est,
           MIN(cnt) - true_cnt AS overestimate
    FROM lookups GROUP BY word, true_cnt
    """,
)
def sketch_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookups against the sketch for the exact top-10 words:
    est(word) = min over rows of cell(d, bucket(d, word)); CMS
    guarantees est ≥ truth (tests assert it), and the reported
    overestimate is the collision error the d×w sizing bounds by
    corpus/w with probability 1-2^-d.

    Scale: the sketch side is the d·w-cell aggregate; lookups join the
    (small) query-word set against ≤ d·w cells — broadcast-sized both
    sides no matter the corpus."""
    words = _word_stream(spark, sf_dir)
    truth = (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "word")
        .limit(10)
    )
    cms = _cms_matrix(spark, sf_dir)
    probes = truth.select(
        "word",
        "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    ).withColumn("bucket", _bucket(F.col("d"), F.col("word")))
    lookups = probes.join(F.broadcast(cms), ["d", "bucket"])
    return lookups.groupBy("word", "true_cnt").agg(
        F.min("cnt").alias("cms_est"),
        (F.min("cnt") - F.col("true_cnt")).alias("overestimate"),
    )


# --- Bloom-filter contamination screen ---------------------------------------

BLOOM_BITS = 4096
BLOOM_K = 3
EVAL_MOD = 10  # eval set = doc_id % 10 == 0 (the held-out benchmark)


def _bloom_bit(j, fp) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat_ws("|", j.cast("string"), fp)), 1, 15), 16, 10)
    return (h.cast("long") % BLOOM_BITS).cast("int")


@query(
    "sketch_bloom_contamination",
    oracle=f"""
    WITH fp AS (SELECT doc_id, md5(text) AS f FROM documents),
    eval_bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || f), 1, 15))::BIGINT
               % {BLOOM_BITS} AS bit
      FROM fp, (SELECT unnest(range(0, {BLOOM_K})) AS j)
      WHERE doc_id % {EVAL_MOD} = 0
    ),
    probes AS (
      SELECT p.doc_id, p.doc_id % {EVAL_MOD} = 0 AS in_eval,
             ('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || p.f), 1, 15))::BIGINT
               % {BLOOM_BITS} AS bit
      FROM fp p, (SELECT unnest(range(0, {BLOOM_K})) AS j) j
    )
    SELECT p.doc_id, p.in_eval,
           (COUNT(e.bit) = {BLOOM_K}) AS flagged
    FROM probes p LEFT JOIN eval_bits e ON p.bit = e.bit
    GROUP BY p.doc_id, p.in_eval
    """,
)
def sketch_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen via a Bloom filter — the
    sketch-based sibling of dedup_contamination: build an md5-seeded
    Bloom filter (m={BLOOM_BITS} bits, k={BLOOM_K} hashes) over the
    held-out eval set's content fingerprints, probe EVERY corpus doc,
    and flag possible members. Bloom guarantees no false negatives
    (every true eval doc flags — gated in-test); false positives are
    the m/k-bounded price. Deterministic md5 bit positions mean the
    DuckDB oracle rebuilds the identical filter, so the gate checks
    build + probe bit-for-bit.

    Scale: the filter is ≤ k·|eval| distinct bit rows (broadcast-
    sized); probing is an equi-join of (doc, bit) rows against it —
    the corpus never shuffles. A real deployment ships the bitset as
    a broadcast variable; the declarative join form here lets AQE pick
    that automatically."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5("text").alias("f"))
    js = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    eval_bits = (
        fp.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(js, "f")
        .select(_bloom_bit(F.col("j"), F.col("f")).alias("bit"))
        .distinct()
    )
    probes = fp.select(
        "doc_id", (F.col("doc_id") % EVAL_MOD == 0).alias("in_eval"), js, "f"
    ).select("doc_id", "in_eval", _bloom_bit(F.col("j"), F.col("f")).alias("bit"))
    joined = probes.join(
        F.broadcast(eval_bits.withColumn("hit", F.lit(1))), "bit", "left"
    )
    return joined.groupBy("doc_id", "in_eval").agg(
        (F.count("hit") == BLOOM_K).alias("flagged")
    )


# --- KMV (k-minimum-values) distinct-count sketch ----------------------------

KMV_K = 16
_KMV_SCALE = 1152921504606846976  # 2^60 — the md5 prefix's value range


def _kmv_u(elem: F.Column) -> F.Column:
    """Element → uniform (0, 1] hash fraction: 60 md5 bits + 1 over
    2^60. Both engines convert the same BIGINT to the same nearest
    double, and division by a power of two is exact, so u is
    bit-identical across Spark and DuckDB."""
    h = F.conv(F.substring(F.md5(elem.cast("string")), 1, 15), 16, 10)
    return (h.cast("long") + F.lit(1)).cast("double") / F.lit(float(_KMV_SCALE))


_KMV_U_SQL = (
    "(('0x' || substr(md5(CAST({e} AS VARCHAR)), 1, 15))::BIGINT + 1)"
    f" / CAST({_KMV_SCALE} AS DOUBLE)"
)

_KMV_PER_TYPE_SQL = f"""
      SELECT event_type, u, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rk
      FROM (SELECT DISTINCT event_type, {_KMV_U_SQL.format(e='user_id')} AS u FROM events)
"""

_KMV_SQL = f"""
    WITH ranked AS ({_KMV_PER_TYPE_SQL}),
    kth AS (SELECT event_type, u AS kth_u FROM ranked WHERE rk = {KMV_K}),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(k.kth_u, 12) AS kth_u,
           ROUND(({KMV_K} - 1) / k.kth_u, 6) AS kmv_est,
           e.exact_distinct,
           ROUND(ABS(({KMV_K} - 1) / k.kth_u - e.exact_distinct) / e.exact_distinct, 6)
             AS rel_err
    FROM exact e JOIN kth k USING (event_type)
"""


@query("sketch_kmv_distinct", oracle=_KMV_SQL)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user sketch per event type:
    hash each user to a uniform (0,1] fraction, keep the k={KMV_K}
    smallest distinct values per group, estimate |distinct| as
    (k-1)/u_(k) — the order-statistics cardinality estimator
    (Bar-Yossef et al. 2002), the mergeable building block HLL
    refines. md5-seeded hashing makes the sketch DETERMINISTIC, so
    the oracle rebuilds it exactly and the gate checks the estimate
    to the 6th decimal; the exact count and realised relative error
    ride along for audit.

    Scale: distinct (event_type, u) is a map-side-combined shuffle on
    uniform keys; the per-group bottom-k window keeps k rows per group
    (WindowGroupLimit pushes the cap to the shuffle read). The state
    per group is k doubles — the whole point of the sketch: a 100 TB
    corpus's per-segment cardinalities in k·|groups| memory."""
    events = load_table(spark, sf_dir, "events")
    hashed = events.select(
        "event_type", _kmv_u(F.col("user_id")).alias("u")
    ).distinct()
    win = Window.partitionBy("event_type").orderBy("u")
    kth = (
        hashed.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == KMV_K)
        .select("event_type", F.col("u").alias("kth_u"))
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    est = (F.lit(KMV_K - 1) / F.col("kth_u")).alias("_e")
    return exact.join(kth, "event_type").select(
        "event_type",
        F.round("kth_u", 12).alias("kth_u"),
        F.round(est, 6).alias("kmv_est"),
        "exact_distinct",
        F.round(
            F.abs(F.lit(KMV_K - 1) / F.col("kth_u") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


_KMV_UNION_SQL = f"""
    WITH ranked AS ({_KMV_PER_TYPE_SQL}),
    merged AS (
      SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rk
      FROM (SELECT DISTINCT u FROM ranked WHERE rk <= {KMV_K})
    ),
    direct AS (
      SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rk
      FROM (SELECT DISTINCT {_KMV_U_SQL.format(e='user_id')} AS u FROM events)
    ),
    exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
    SELECT ROUND(({KMV_K} - 1) / m.u, 6) AS union_est,
           ROUND(({KMV_K} - 1) / d.u, 6) AS direct_est,
           m.u = d.u AS merge_equals_direct,
           e.exact_distinct
    FROM (SELECT u FROM merged WHERE rk = {KMV_K}) m,
         (SELECT u FROM direct WHERE rk = {KMV_K}) d,
         exact e
"""


@query("sketch_kmv_union", oracle=_KMV_UNION_SQL)
def sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV mergeability, demonstrated ON the gate: the union sketch
    built by merging the per-event-type k-sets (bottom-k of their
    deduplicated union) must equal the sketch built directly over all
    events — bottom-k-of-union = bottom-k-of-(per-part bottom-k), the
    identity that lets a 1000-executor cluster sketch each partition
    independently and combine k·P values on one reducer. The result
    row carries both estimates, the merge_equals_direct proof bit
    (asserted true in tests), and the exact count.

    Scale: the merge input is k·|groups| rows — driver-trivial no
    matter the corpus; the direct arm exists only to prove the merge
    and reuses the same distinct-hash frame shape."""
    events = load_table(spark, sf_dir, "events")
    hashed = events.select(
        "event_type", _kmv_u(F.col("user_id")).alias("u")
    ).distinct()
    win = Window.partitionBy("event_type").orderBy("u")
    per_type = (
        hashed.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= KMV_K)
        .select("u")
        .distinct()
    )
    gw = Window.orderBy("u")
    merged_kth = (
        per_type.withColumn("rk", F.row_number().over(gw))
        .filter(F.col("rk") == KMV_K)
        .select(F.col("u").alias("mu"))
    )
    direct_kth = (
        hashed.select("u")
        .distinct()
        .withColumn("rk", F.row_number().over(gw))
        .filter(F.col("rk") == KMV_K)
        .select(F.col("u").alias("du"))
    )
    exact = events.agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        merged_kth.crossJoin(direct_kth)
        .crossJoin(exact)
        .select(
            F.round(F.lit(KMV_K - 1) / F.col("mu"), 6).alias("union_est"),
            F.round(F.lit(KMV_K - 1) / F.col("du"), 6).alias("direct_est"),
            (F.col("mu") == F.col("du")).alias("merge_equals_direct"),
            "exact_distinct",
        )
    )

# --- Misra-Gries heavy hitters -----------------------------------------------

MG_K = 64  # counters per partition summary; threshold = total/K


_HH_SQL = f"""
    WITH words AS ({_WORDS_SQL}),
    nz AS (SELECT word FROM words WHERE word != '')
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM nz GROUP BY word
    HAVING COUNT(*) * {MG_K} > (SELECT COUNT(*) FROM nz)
"""


def mg_candidates(words: DataFrame, k: int = MG_K) -> DataFrame:
    """Phase 1 of the two-phase heavy-hitter plan: one Misra-Gries
    summary (k counters, Agarwal et al. 2013 mergeable form) per
    input partition via Arrow ``mapInPandas``, O(k) memory per task
    and ZERO shuffle of the full key space. Each Arrow batch's
    value_counts merges into the running summary; overflow subtracts
    the (k+1)-th largest count and drops non-positive counters — the
    classic decrement, batched. Guarantee (pigeonhole over
    partitions): any key with global freq > total/k survives in at
    least one partition's summary, so the union of summaries is a
    candidate superset of the true heavy hitters."""

    def _summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {w: c - kth for w, c in counters.items() if c > kth}
        yield pd.DataFrame({"word": list(counters)})

    return words.mapInPandas(_summarize, "word string").distinct()


@query("sketch_heavy_hitters", oracle=_HH_SQL)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-threshold heavy hitters (freq > total/{MG_K}) over
    corpus words by the two-phase Misra-Gries plan: per-partition
    k-counter summaries (``mg_candidates``) → tiny candidate union
    (≤ k rows per partition) → exact recount of ONLY the candidates
    via a broadcast semi-join → threshold filter on the exact counts.
    Because phase 1 provably never drops a true heavy hitter and
    phase 2 recounts exactly, the output is the EXACT heavy-hitter
    set regardless of partition layout — a deterministic result from
    a sketch-shaped plan, which is what lets the DuckDB oracle state
    it as plain GROUP BY ... HAVING.

    Scale: the alternative (full groupBy(word) then filter) shuffles
    the entire vocabulary; this plan shuffles ≤ k·P candidate words
    plus their partial counts. At 100 TB with a web-scale vocabulary
    (billions of distinct tokens, Zipf tail) that is the difference
    between a terabyte-scale shuffle and a broadcast. The 1-row total
    used by the threshold is a broadcast scalar."""
    words = _word_stream(spark, sf_dir)
    cands = mg_candidates(words)
    total = words.agg(F.count("*").cast("long").alias("total"))
    recount = (
        words.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * MG_K > F.col("total"))
        .select("word", "freq")
    )

# --- Equi-width histogram quantile sketch ------------------------------------

QH_BINS = 64
_QH_QS = "0.25, 0.5, 0.75, 0.9, 0.99"

_QH_SQL = f"""
    WITH x AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL),
    s AS (SELECT MIN(x) AS mn, MAX(x) AS mx, CAST(COUNT(*) AS BIGINT) AS n FROM x),
    b AS (
      SELECT LEAST(CAST(FLOOR((x.x - s.mn) / ((s.mx - s.mn) / {QH_BINS})) AS INT),
                   {QH_BINS - 1}) AS bin
      FROM x, s
    ),
    h AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
    qs AS (SELECT CAST(unnest([{_QH_QS}]) AS DOUBLE) AS q),
    tgt AS (SELECT q, CAST(CEIL(q * s.n) AS BIGINT) AS r FROM qs, s),
    pick AS (
      SELECT t.q, t.r, MIN(c.bin) AS bin
      FROM tgt t JOIN c ON c.cum >= t.r GROUP BY t.q, t.r
    ),
    ranked AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk FROM x)
    SELECT p.q, p.r AS target_rank,
           ROUND(s.mn + (p.bin + 1) * ((s.mx - s.mn) / {QH_BINS}), 6) AS est_q,
           ROUND(rx.x, 6) AS exact_q,
           ROUND(s.mn + (p.bin + 1) * ((s.mx - s.mn) / {QH_BINS}) - rx.x, 6) AS err,
           (s.mn + (p.bin + 1) * ((s.mx - s.mn) / {QH_BINS}) - rx.x) >= 0
             AND (s.mn + (p.bin + 1) * ((s.mx - s.mn) / {QH_BINS}) - rx.x)
                 <= ((s.mx - s.mn) / {QH_BINS}) AS within_bin
    FROM pick p, s, ranked rx WHERE rx.rk = p.r
"""


@query("sketch_quantile_histogram", oracle=_QH_SQL)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a mergeable equi-width histogram
    sketch over ``events.value``: a {QH_BINS}-bin count histogram
    (bins over the observed [min, max]) replaces the full sort an
    exact quantile needs; the q-quantile is read off the cumulative
    bin counts as the right edge of the bin holding rank ceil(q·n).
    The right-edge rule gives the one-sided guarantee
    0 ≤ est − exact ≤ bin_width, carried per row as ``within_bin``
    (asserted all-true in tests; the exact arm rides along for audit
    exactly like sketch_kmv_distinct's).

    Scale: bin counts are a {QH_BINS}-cell aggregate — map-side
    combine bounds the shuffle at {QH_BINS} partials per task, and
    histograms from disjoint slices merge by addition (same argument
    as Count-Min), so a 100 TB column costs one scan plus a
    {QH_BINS}-row reduce; the min/max pre-pass is a 1-row broadcast.
    The exact rank arm (a global sort) exists only to measure the
    sketch's realized error at gate scale — production reads the
    histogram alone."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.col("value").cast("double").alias("x"))
        .filter(F.col("x").isNotNull())
    )
    stats = ev.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count("*").cast("long").alias("n")
    )
    width = (F.col("mx") - F.col("mn")) / QH_BINS
    hist = (
        ev.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("x") - F.col("mn")) / width).cast("int"), F.lit(QH_BINS - 1)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(Window.orderBy("bin")))
    qs = spark.range(1).select(
        F.explode(F.expr(f"array({_QH_QS})").cast("array<double>")).alias("q")
    )
    tgt = qs.crossJoin(F.broadcast(stats)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("r"), "mn", "mx"
    )
    pick = (
        tgt.join(F.broadcast(cum), F.col("cum") >= F.col("r"))
        .groupBy("q", "r", "mn", "mx")
        .agg(F.min("bin").alias("bin"))
    )
    # exact-rank audit arm via the distributed two-phase primitive —
    # the value at rank r is unique even under ties, so ordering by x
    # alone is enough (ties occupy contiguous ranks with equal x)
    ranked = global_row_number(ev, F.col("x"), [F.col("x")], "rk")
    est = F.col("mn") + (F.col("bin") + 1) * ((F.col("mx") - F.col("mn")) / QH_BINS)
    w = (F.col("mx") - F.col("mn")) / QH_BINS
    return pick.join(ranked, F.col("rk") == F.col("r")).select(
        "q",
        F.col("r").alias("target_rank"),
        F.round(est, 6).alias("est_q"),
        F.round(F.col("x"), 6).alias("exact_q"),
        F.round(est - F.col("x"), 6).alias("err"),
        (((est - F.col("x")) >= 0) & ((est - F.col("x")) <= w)).alias("within_bin"),
    )

# --- AMS F2 (second frequency moment) sketch ---------------------------------

AMS_ESTIMATORS = 16


_AMS_SQL = f"""
    WITH r AS (SELECT user_id FROM events),
    z AS (
      SELECT j,
             CAST(SUM(2 * (('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || user_id), 1, 15))::BIGINT % 2) - 1)
                  AS BIGINT) AS z
      FROM r, (SELECT unnest(range(0, {AMS_ESTIMATORS})) AS j)
      GROUP BY j
    ),
    est AS (
      SELECT CAST(SUM(z * z) AS DOUBLE) / {AMS_ESTIMATORS} AS f2_est FROM z
    ),
    exact AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * c) AS BIGINT) AS f2_exact
      FROM (SELECT user_id, COUNT(*) AS c FROM r GROUP BY user_id)
    )
    SELECT x.n, x.n_distinct,
           ROUND(e.f2_est, 6) AS f2_est,
           x.f2_exact,
           ROUND(ABS(e.f2_est - x.f2_exact) / x.f2_exact, 6) AS rel_err,
           ROUND(CAST(x.f2_exact AS DOUBLE) * x.n_distinct / (CAST(x.n AS DOUBLE) * x.n), 6)
             AS skew_ratio
    FROM est e CROSS JOIN exact x
"""


@query("sketch_ams_f2", oracle=_AMS_SQL)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch over the event stream's
    user_id key (Alon-Matias-Szegedy 1996): {AMS_ESTIMATORS} ±1-signed
    sums Z_j (sign = an md5 bit of (j, key)), F2 ≈ mean of Z_j² —
    estimated WITHOUT ever aggregating by key. F2 is the statistic
    that decides shuffle strategy: skew_ratio = F2·|keys|/n² is 1.0
    for a perfectly uniform key and grows with concentration, so a
    pipeline reads this one row to decide whether agg_skew_salted's
    salting is needed before a groupBy/join on the key. The exact
    arm (one key aggregate) rides along for audit with the realized
    relative error, exactly the KMV/CMS reporting design; md5 signs
    make the sketch deterministic so the gate checks it bit-for-bit.

    Scale: the sketch side explodes each row into {AMS_ESTIMATORS}
    signed contributions and reduces to {AMS_ESTIMATORS} cells —
    map-side combine bounds the shuffle at {AMS_ESTIMATORS} partials
    per task and the KEY IS NEVER SHUFFLED (the whole point when the
    key is skewed enough to make the exact aggregate the problem).
    Sketches from disjoint slices merge by adding Z_j."""
    r = load_table(spark, sf_dir, "events").select("user_id")
    j = F.explode(F.sequence(F.lit(0), F.lit(AMS_ESTIMATORS - 1))).alias("j")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("j").cast("string"), F.col("user_id"))), 1, 15
        ),
        16,
        10,
    )
    signed = r.select(j, "user_id").select(
        "j", (2 * (h.cast("long") % 2) - 1).alias("s")
    )
    z = signed.groupBy("j").agg(F.sum("s").cast("long").alias("z"))
    est = z.agg(
        (F.sum(F.col("z") * F.col("z")).cast("double") / AMS_ESTIMATORS).alias("f2_est")
    )
    exact = (
        r.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"),
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n",
        "n_distinct",
        F.round("f2_est", 6).alias("f2_est"),
        "f2_exact",
        F.round(F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact"), 6).alias(
            "rel_err"
        ),
        F.round(
            F.col("f2_exact").cast("double")
            * F.col("n_distinct")
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("skew_ratio"),
    )


# --- HyperLogLog (explicit registers) ----------------------------------------

# Flajolet et al. 2007: m = 2^p registers, register j keeps the max
# rank (leading-zeros+1) of the hash suffix among keys routed to j;
# estimate = alpha_m * m^2 / sum(2^-reg). p=6 -> 64 registers, alpha_64
# = 0.709. The 60-bit md5 hash splits top-6 bucket / 54-bit suffix.
# Ranks are clamped at 48 so sum(2^-reg) is a sum of dyadic rationals
# k/2^48 whose total needs <= 53 mantissa bits — EXACT in double in any
# summation order, which is what makes the estimate bit-identical
# across engines (the engine-determinism analogue of the decimal-sum
# rule). Spark's approx_count_distinct wraps its own HLL++ (gated in
# approx.py); this is the register-level construction, portable and
# mergeable by pairwise MAX — the form you persist per partition/day
# and OR together at 100 TB.

HLL_P = 6
HLL_M = 1 << HLL_P  # 64
HLL_ALPHA = 0.709  # alpha_64
_HLL_SUFFIX_BITS = 60 - HLL_P  # 54
_HLL_RANK_CAP = 48

_HLL_HASH_SQL = "('0x' || substr(md5('hll|' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT"

_HLL_REG_SQL = f"""
    WITH h AS (
      SELECT DISTINCT {_HLL_HASH_SQL} AS hv FROM orders
    ),
    br AS (
      SELECT CAST(hv // {1 << _HLL_SUFFIX_BITS} AS BIGINT) AS bucket,
             hv % {1 << _HLL_SUFFIX_BITS} AS suffix
      FROM h
    ),
    rk AS (
      SELECT bucket,
             LEAST(CASE WHEN suffix = 0 THEN {_HLL_SUFFIX_BITS + 1}
                        ELSE {_HLL_SUFFIX_BITS + 1} - length(bin(suffix)) END,
                   {_HLL_RANK_CAP}) AS rank
      FROM br
    )
    SELECT bucket, CAST(MAX(rank) AS BIGINT) AS reg
    FROM rk GROUP BY bucket
"""


@query("sketch_hll_registers", oracle=_HLL_REG_SQL)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table over orders.o_custkey — every occupied
    bucket's max rank, register-exact vs the oracle. Shuffle carries
    at most m=64 rows after the map-side MAX combine; the register
    table is the mergeable persisted artifact (pairwise MAX merges
    shards/days)."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col("o_custkey").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    suffix_mod = 1 << _HLL_SUFFIX_BITS
    d = o.select(h.alias("hv")).distinct()
    br = d.select(
        F.shiftrightunsigned(F.col("hv"), _HLL_SUFFIX_BITS).alias("bucket"),
        (F.col("hv") % suffix_mod).alias("suffix"),
    )
    rank = F.least(
        F.when(F.col("suffix") == 0, F.lit(_HLL_SUFFIX_BITS + 1)).otherwise(
            F.lit(_HLL_SUFFIX_BITS + 1) - F.length(F.bin(F.col("suffix")))
        ),
        F.lit(_HLL_RANK_CAP),
    )
    return (
        br.select("bucket", rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").cast("long").alias("reg"))
    )


_HLL_EST_SQL = f"""
    WITH regs AS ({_HLL_REG_SQL}),
    allregs AS (
      SELECT m.bucket, COALESCE(r.reg, 0) AS reg
      FROM (SELECT unnest(range(0, {HLL_M})) AS bucket) m
      LEFT JOIN regs r USING (bucket)
    ),
    s AS (
      SELECT SUM(power(2.0, 0 - reg)) AS harm,
             CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM allregs
    ),
    e AS (
      SELECT CASE
               WHEN {HLL_ALPHA} * {HLL_M} * {HLL_M} / harm <= 2.5 * {HLL_M}
                    AND n_zero > 0
               THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / n_zero)
               ELSE {HLL_ALPHA} * {HLL_M} * {HLL_M} / harm
             END AS raw_est,
             n_zero
      FROM s
    ),
    t AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
          FROM orders)
    SELECT ROUND(e.raw_est, 4) AS hll_est,
           e.n_zero,
           t.exact_distinct,
           ROUND(ABS(e.raw_est - t.exact_distinct) / t.exact_distinct, 6) AS rel_err,
           (ABS(e.raw_est - t.exact_distinct) / t.exact_distinct
              <= 3 * 1.04 / sqrt({HLL_M})) AS within_3_sigma
    FROM e, t
"""


@query("sketch_hll_estimate", oracle=_HLL_EST_SQL)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL cardinality read-off with its accuracy contract: the
    raw harmonic-mean estimate (linear-counting small-range branch
    included for faithfulness, not taken at this cardinality), the
    exact distinct count, and a gated within-3σ check against the
    theoretical 1.04/√m standard error — the same
    estimate-plus-error-bound harness shape as sketch_kmv_distinct
    and approx_distinct_users.

    Scale: registers shuffle ≤ m rows (map-side MAX); the read-off is
    a 64-row fold. Exactness note: ranks are capped at 48, making
    sum(2^-reg) order-independent in double (see module constant)."""
    regs = sketch_hll_registers(spark, sf_dir)
    spark_range = spark.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    full = spark_range.join(regs, "bucket", "left").select(
        "bucket", F.coalesce(F.col("reg"), F.lit(0)).alias("reg")
    )
    s = full.agg(
        F.sum(F.pow(F.lit(2.0), 0 - F.col("reg"))).alias("harm"),
        F.sum((F.col("reg") == 0).cast("int")).cast("long").alias("n_zero"),
    )
    o = load_table(spark, sf_dir, "orders")
    t = o.agg(F.countDistinct("o_custkey").cast("long").alias("exact_distinct"))
    raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("harm")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_zero") > 0),
        HLL_M * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
    ).otherwise(raw)
    return (
        s.crossJoin(t)
        .select(
            F.round(est, 4).alias("hll_est"),
            "n_zero",
            "exact_distinct",
            F.round(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_err"
            ),
            (
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct")
                <= 3 * 1.04 / (HLL_M ** 0.5)
            ).alias("within_3_sigma"),
        )
    )


# --- KMV intersection / Jaccard ----------------------------------------------

KMV_TYPE_A, KMV_TYPE_B = "view", "click"

_KMV_INTER_SQL = f"""
    WITH ranked AS ({_KMV_PER_TYPE_SQL}),
    ka AS (SELECT u FROM ranked WHERE event_type = '{KMV_TYPE_A}' AND rk <= {KMV_K}),
    kb AS (SELECT u FROM ranked WHERE event_type = '{KMV_TYPE_B}' AND rk <= {KMV_K}),
    uni AS (
      SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rk
      FROM (SELECT u FROM ka UNION SELECT u FROM kb)
    ),
    bk AS (SELECT u FROM uni WHERE rk <= {KMV_K}),
    kth AS (SELECT u AS kth_u FROM uni WHERE rk = {KMV_K}),
    rho AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_both
      FROM bk
      WHERE u IN (SELECT u FROM ka) AND u IN (SELECT u FROM kb)
    ),
    ex AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS exact_inter
      FROM (
        SELECT user_id FROM events WHERE event_type = '{KMV_TYPE_A}' GROUP BY user_id
        INTERSECT
        SELECT user_id FROM events WHERE event_type = '{KMV_TYPE_B}' GROUP BY user_id
      )
    )
    SELECT '{KMV_TYPE_A}' AS type_a, '{KMV_TYPE_B}' AS type_b,
           ROUND(({KMV_K} - 1) / k.kth_u, 6) AS union_est,
           ROUND(CAST(r.n_both AS DOUBLE) / {KMV_K}, 6) AS jaccard_est,
           ROUND(CAST(r.n_both AS DOUBLE) / {KMV_K}
                 * (({KMV_K} - 1) / k.kth_u), 6) AS inter_est,
           e.exact_inter,
           ROUND(ABS(CAST(r.n_both AS DOUBLE) / {KMV_K}
                     * (({KMV_K} - 1) / k.kth_u) - e.exact_inter)
                 / e.exact_inter, 6) AS rel_err_inter
    FROM kth k, rho r, ex e
"""


@query("sketch_kmv_intersection", oracle=_KMV_INTER_SQL)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra beyond union (the theta-sketch operation set):
    estimate |A ∩ B| and Jaccard between two event types' user sets
    FROM THEIR SKETCHES ALONE — ρ = fraction of the union sketch's
    bottom-k present in both per-type k-sets, intersection = ρ ×
    union estimate (Beyer et al. 2007). The gate carries the exact
    intersection and realized relative error, the same
    estimate-plus-error harness as the rest of the sketch family.

    Scale: everything after the per-type bottom-k (k·|types| rows) is
    driver-trivial; the per-type sketches are the SAME ones
    sketch_kmv_distinct maintains, so the marginal cost of an
    intersection query on persisted sketches is zero corpus reads."""
    events = load_table(spark, sf_dir, "events")
    hashed = events.select(
        "event_type", _kmv_u(F.col("user_id")).alias("u")
    ).distinct()
    win = Window.partitionBy("event_type").orderBy("u")
    ranked = hashed.withColumn("rk", F.row_number().over(win))
    ka = ranked.filter(
        (F.col("event_type") == KMV_TYPE_A) & (F.col("rk") <= KMV_K)
    ).select("u")
    kb = ranked.filter(
        (F.col("event_type") == KMV_TYPE_B) & (F.col("rk") <= KMV_K)
    ).select("u")
    uni = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("rk", F.row_number().over(Window.orderBy("u")))
    )
    bk = uni.filter(F.col("rk") <= KMV_K).select("u")
    kth = uni.filter(F.col("rk") == KMV_K).select(F.col("u").alias("kth_u"))
    n_both = (
        bk.join(ka, "u", "left_semi")
        .join(kb, "u", "left_semi")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    exact = (
        events.filter(F.col("event_type") == KMV_TYPE_A)
        .select("user_id")
        .intersect(
            events.filter(F.col("event_type") == KMV_TYPE_B).select("user_id")
        )
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    union_est = F.lit(KMV_K - 1) / F.col("kth_u")
    rho = F.col("n_both").cast("double") / KMV_K
    inter_est = rho * union_est
    return (
        kth.crossJoin(n_both)
        .crossJoin(exact)
        .select(
            F.lit(KMV_TYPE_A).alias("type_a"),
            F.lit(KMV_TYPE_B).alias("type_b"),
            F.round(union_est, 6).alias("union_est"),
            F.round(rho, 6).alias("jaccard_est"),
            F.round(inter_est, 6).alias("inter_est"),
            "exact_inter",
            F.round(
                F.abs(inter_est - F.col("exact_inter")) / F.col("exact_inter"), 6
            ).alias("rel_err_inter"),
        )
    )


# --- HLL sliding-window merge --------------------------------------------------

# The property that justifies sketches at 100 TB is MERGEABILITY: one
# register shard per (day) partition, persisted at write time, and any
# window over days answered later by pairwise-MAX folding shards —
# never re-reading the raw data. This query materializes the per-day
# shard table and reads off a 7-day sliding weekly-active-users
# estimate per day, with the exact count and relative error beside it.

_HLLS_WINDOW_DAYS = 7
_HLLS_HASH_SQL = "('0x' || substr(md5('hlls|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"

_HLLS_SQL = f"""
    WITH h AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, {_HLLS_HASH_SQL} AS hv FROM events
    ),
    rk AS (
      SELECT day, CAST(hv // {1 << _HLL_SUFFIX_BITS} AS BIGINT) AS bucket,
             LEAST(CASE WHEN hv % {1 << _HLL_SUFFIX_BITS} = 0 THEN {_HLL_SUFFIX_BITS + 1}
                        ELSE {_HLL_SUFFIX_BITS + 1}
                             - length(bin(hv % {1 << _HLL_SUFFIX_BITS})) END,
                   {_HLL_RANK_CAP}) AS rank
      FROM h
    ),
    shard AS (SELECT day, bucket, MAX(rank) AS reg FROM rk GROUP BY day, bucket),
    days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
    grid AS (
      SELECT d.day, date_diff('day', TIMESTAMP '1970-01-01', d.day) AS epoch_day,
             m.bucket, COALESCE(s.reg, 0) AS reg
      FROM days d
      CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) m
      LEFT JOIN shard s ON s.day = d.day AND s.bucket = m.bucket
    ),
    merged AS (
      SELECT day, bucket,
             MAX(reg) OVER (PARTITION BY bucket ORDER BY epoch_day
                            RANGE BETWEEN {_HLLS_WINDOW_DAYS - 1} PRECEDING
                                  AND CURRENT ROW) AS reg
      FROM grid
    ),
    s AS (
      SELECT day, SUM(power(2.0, 0 - reg)) AS harm,
             CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM merged GROUP BY day
    ),
    est AS (
      SELECT day, n_zero,
             CASE WHEN {HLL_ALPHA} * {HLL_M} * {HLL_M} / harm <= 2.5 * {HLL_M}
                       AND n_zero > 0
                  THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / n_zero)
                  ELSE {HLL_ALPHA} * {HLL_M} * {HLL_M} / harm END AS raw_est
      FROM s
    ),
    ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    ex AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_wau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - INTERVAL {_HLLS_WINDOW_DAYS - 1} DAY AND d.day
      GROUP BY d.day
    )
    SELECT e.day, ROUND(e.raw_est, 4) AS hll_wau, e.n_zero, x.exact_wau,
           ROUND(ABS(e.raw_est - x.exact_wau) / x.exact_wau, 6) AS rel_err
    FROM est e JOIN ex x ON e.day = x.day
"""


@query("sketch_hll_sliding", oracle=_HLLS_SQL)
def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding weekly-active-users from per-day HLL register shards.

    Per-day registers are the persisted artifact (|days| x m <= 64
    rows/day after the map-side MAX combine); the 7-day read-off is a
    RANGE-frame MAX per bucket over the dense day x bucket grid plus a
    64-row fold per day — the raw events are touched exactly once no
    matter how many windows are asked. The exact arm (for the gated
    rel_err) re-counts distinct users per window and is the thing the
    sketch REPLACES at scale: its shuffle grows with window x corpus,
    the sketch's with |days| x m.

    Determinism: same rank-cap-48 dyadic-exactness argument as
    sketch_hll_registers; at this cardinality (tens of users/window)
    the linear-counting branch is the one exercised.
    """
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hlls|"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    suffix_mod = 1 << _HLL_SUFFIX_BITS
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hv = e.select(day, h.alias("hv")).distinct()
    rank = F.least(
        F.when(F.col("hv") % suffix_mod == 0, F.lit(_HLL_SUFFIX_BITS + 1)).otherwise(
            F.lit(_HLL_SUFFIX_BITS + 1) - F.length(F.bin(F.col("hv") % suffix_mod))
        ),
        F.lit(_HLL_RANK_CAP),
    )
    shard = (
        hv.select(
            "day", F.shiftrightunsigned(F.col("hv"), _HLL_SUFFIX_BITS).alias("bucket"), rank.alias("rank")
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("reg"))
    )
    days = e.select(day).distinct()
    grid = (
        days.select(
            "day",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("timestamp")).cast("long").alias(
                "epoch_day"
            ),
            F.explode(F.array([F.lit(i) for i in range(HLL_M)])).alias("bucket"),
        )
        .join(shard.withColumnRenamed("reg", "sreg"), ["day", "bucket"], "left")
        .select(
            "day", "epoch_day", "bucket", F.coalesce(F.col("sreg"), F.lit(0)).alias("reg")
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("epoch_day")
        .rangeBetween(-(_HLLS_WINDOW_DAYS - 1), 0)
    )
    merged = grid.select("day", F.max("reg").over(w).alias("reg"))
    s = merged.groupBy("day").agg(
        F.sum(F.pow(F.lit(2.0), 0 - F.col("reg"))).alias("harm"),
        F.sum((F.col("reg") == 0).cast("int")).cast("long").alias("n_zero"),
    )
    raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("harm")
    est_col = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_zero") > 0),
        HLL_M * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
    ).otherwise(raw)
    est = s.select("day", "n_zero", est_col.alias("raw_est"))
    ud = e.select(day, "user_id").distinct()
    ex = (
        F.broadcast(days.withColumnRenamed("day", "d"))
        .join(
            ud,
            (F.col("day") >= F.timestamp_add("DAY", F.lit(-(_HLLS_WINDOW_DAYS - 1)), F.col("d")))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_wau"))
    )
    return est.join(ex, est.day == ex.d).select(
        "day",
        F.round(F.col("raw_est"), 4).alias("hll_wau"),
        "n_zero",
        "exact_wau",
        F.round(F.abs(F.col("raw_est") - F.col("exact_wau")) / F.col("exact_wau"), 6).alias(
            "rel_err"
        ),
    )
