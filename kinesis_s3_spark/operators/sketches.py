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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
