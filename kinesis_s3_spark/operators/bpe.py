"""BPE tokenizer training over the documents corpus (north-star
LLM-pipeline extension; BASELINE.json) — the iterative merge-learning
step of byte-pair encoding, the same loop GPT-2's tokenizer trains
with, expressed Spark-first like emb_kmeans's Lloyd loop.

Per merge round: count adjacent symbol pairs across the corpus
(weighted by word frequency), pick the most frequent pair
(deterministic (count desc, l, r) tie-break), merge every
non-overlapping occurrence left-to-right, repeat. The cross-engine
trick that keeps the DuckDB oracle bit-exact: a word's segmentation is
a SPACE-JOINED string ("c a t"), so greedy left-to-right merging is
exactly ``replace(seg, 'l r', 'lr')`` — Java's String.replace and
DuckDB's replace() share non-overlapping left-to-right semantics, and
the oracle unrolls all N_MERGES rounds as a CTE chain.

Scale: each round is one explode→groupBy over (pairs × word-freqs)
(map-side combined, shuffle carries distinct pairs), a 1-row argmax
collect (the merge itself — legitimately driver-sized, like k-means
centroids), and a map-stage segmentation rewrite. Linear in corpus
per round; rounds = vocabulary budget. The word-freq frame is cached
across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

N_MERGES = 3

# one merge round in SQL: pair counts over {s} → top pair {t} → merged
# segmentations {sn}
_BPE_ROUND_SQL = """
    p{k} AS (
      SELECT t.l AS l, t.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest([{{'l': toks[i], 'r': toks[i+1]}} for i in range(1, len(toks))]) AS t
        FROM (SELECT freq, string_split(seg, ' ') AS toks FROM {s})
      )
      GROUP BY t.l, t.r
    ),
    t{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
    {sn} AS (
      SELECT word, freq,
             replace(seg, (SELECT l || ' ' || r FROM t{k}), (SELECT l || r FROM t{k})) AS seg
      FROM {s}
    )
"""

_BPE_SQL = (
    r"""
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
            FROM documents)
      WHERE word != ''
      GROUP BY word
    ),
    s0 AS (SELECT word, freq, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seg FROM w0),
    """
    + ",".join(
        _BPE_ROUND_SQL.format(k=k, s=f"s{k-1}", sn=f"s{k}") for k in range(1, N_MERGES + 1)
    )
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {k} AS merge_rank, l, r, cnt AS pair_count FROM t{k}"
        for k in range(1, N_MERGES + 1)
    )
)


@query("text_bpe_train", oracle=_BPE_SQL)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first N_MERGES BPE merges over the corpus (module
    docstring): returns the merge table (merge_rank, l, r, pair_count)
    — the trained tokenizer artifact. The DuckDB oracle re-runs the
    identical training loop unrolled, so the gate checks pair
    counting, the deterministic argmax, AND the greedy left-to-right
    merge rewrites end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, N_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, l string, r string, pair_count bigint"
    )


def train_bpe(docs: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """The training loop over any (text) frame — returns the learned
    merge table [(rank, l, r, weighted_pair_count), ...]."""
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    cur = (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("seg", F.trim(F.regexp_replace("word", "(.)", "$1 ")))
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        toks = F.split("seg", " ")
        pairs = (
            cur.filter(F.size(toks) >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.struct(
                            F.element_at(toks, i).alias("l"),
                            F.element_at(toks, i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .select("freq", "p.l", "p.r")
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()[0]
        )
        merges.append((rank, top["l"], top["r"], int(top["cnt"])))
        nxt = cur.withColumn(
            "seg",
            F.replace(F.col("seg"), F.lit(f"{top['l']} {top['r']}"), F.lit(top["l"] + top["r"])),
        ).cache()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


# --- apply the learned merges back to the corpus -----------------------------

_BPE_TOKENIZE_SQL = (
    _BPE_SQL.split("\n    SELECT 1 AS merge_rank")[0]
    + r""",
    docw AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      FROM documents
    ),
    d0 AS (SELECT doc_id, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seg
           FROM docw WHERE word != ''),
"""
    + ",".join(
        f"""
    d{k} AS (
      SELECT doc_id,
             replace(seg, (SELECT l || ' ' || r FROM t{k}), (SELECT l || r FROM t{k})) AS seg
      FROM d{k-1}
    )"""
        for k in range(1, N_MERGES + 1)
    )
    + f"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split(seg, ' '))) AS BIGINT) AS n_symbols
    FROM d{N_MERGES} GROUP BY doc_id
"""
)


@query("text_bpe_tokenize", oracle=_BPE_TOKENIZE_SQL)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → apply composition: learn the N_MERGES BPE merges, then
    tokenize the SAME corpus with them — per document, the word count
    and the post-merge symbol count (the 'how many tokens is my corpus
    under this tokenizer' question every training-data budget starts
    with). The oracle re-runs training AND the per-document replace
    chain, so the gate checks the composition end-to-end.

    Scale: training as text_bpe_train; application is a pure map stage
    (the merge table arrives as expression literals — the k-means
    centroid-literal pattern) + one groupBy(doc_id) count."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, N_MERGES)
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    seg = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    for _rank, left, right, _cnt in merges:
        seg = F.replace(seg, F.lit(f"{left} {right}"), F.lit(left + right))
    return words.select("doc_id", F.size(F.split(seg, " ")).alias("n_sym")).groupBy(
        "doc_id"
    ).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_symbols"),
    )
