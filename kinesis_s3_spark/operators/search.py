"""Full-text retrieval over the documents corpus (north-star
extension; BASELINE.json): BM25 ranked search and inverted-index
construction — the two sides of the lexical-retrieval path a training
-data pipeline runs for decontamination lookups, dedup-candidate
blocking, and eval-set leakage scans.

Spark-first shapes:
- BM25 is two (doc, word) aggregations (both map-side combined, same
  uniform keys as text_tfidf_topk) plus a |query|-row broadcast of the
  term statistics — the corpus-sized data only ever shuffles on
  (doc_id, word).
- The inverted index caps posting lists BEFORE materialising them:
  a per-word window rank (WindowGroupLimit pushes the cap into the
  shuffle read) keeps at most POSTINGS_CAP doc ids per word, while the
  full df / total-tf stats come from a separate count-only aggregate.
  The uncapped collect_list-per-word formulation would concentrate a
  stop-word's whole posting list in one task at 100 TB; this one is
  bounded by construction.

Determinism (registry rules): per-term score contributions are rounded
to 6 dp and summed as DECIMAL(18,6) so addition order cannot move the
result; rankings carry doc_id tie-breaks; ln() on identical doubles is
bit-identical across Spark and DuckDB (text_tfidf_topk precedent).

Reference parity note: the reference (snowplow/kinesis-s3) has no
query surface at all (SURVEY.md §2 explicit-absence table) — these
operators extend the engine for the LLM-curation north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.functions.text import tokens
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

# Okapi BM25 free parameters (the textbook defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
QUERY_TERMS = ("hash", "join", "vector")

POSTINGS_CAP = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_DOCWORDS_SQL = r"""
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      FROM documents WHERE length(trim(text)) > 0
"""

_BM25_SQL = f"""
    WITH w AS ({_DOCWORDS_SQL}),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM w
      WHERE word IN ({_TERMS_SQL}) GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word),
    contrib AS (
      SELECT t.doc_id,
             CAST(ROUND(
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / s.avgdl)),
               6) AS DECIMAL(18, 6)) AS c
      FROM tf t
      JOIN df d USING (word)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {BM25_TOPK}
"""


@query("text_bm25_search", oracle=_BM25_SQL)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed 3-term query — the
    ranked lexical retrieval a decontamination pass runs per eval
    prompt.

    Plan: ONE token explode feeding ONE (doc_id) aggregation that
    computes the document length AND the per-query-term tfs together
    (the term set is a fixed literal, so tf-per-term is a conditional
    sum, not a second shuffle); the cached per-doc frame then yields
    the 1-row corpus stats (n_docs, avgdl, per-term dfs) and the
    row-wise BM25 score — zero further shuffles. Final top-10 is a
    global TakeOrderedAndProject. The per-term contribution is rounded
    to 6 dp then summed as DECIMAL(18,6) (registry determinism rule)
    so Spark's and DuckDB's addition orders agree bit-exactly; a
    zero-tf term contributes an exact decimal 0, matching the oracle's
    absent-row semantics. 100 TB: the single corpus-sized shuffle keys
    on doc_id — uniform, map-side combined; everything downstream of
    it is broadcast-tiny or row-local."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    w = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word")
    )
    per_doc = (
        w.groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            *[
                F.sum((F.col("word") == t).cast("long")).alias(f"tf{i}")
                for i, t in enumerate(QUERY_TERMS)
            ],
        )
        .cache()
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("double").alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )

    def _contrib(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        tf_norm = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        return F.round(idf * tf_norm, 6).cast("decimal(18,6)")

    hit = sum(F.col(f"tf{i}") for i in range(len(QUERY_TERMS)))
    score = sum(_contrib(i) for i in range(len(QUERY_TERMS))).cast("double")
    scored = (
        per_doc.filter(hit > 0)
        .join(F.broadcast(stats))
        .select("doc_id", score.alias("score"))
    )
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("doc_id", "score", "rank")
    )


_INVINDEX_SQL = f"""
    WITH w AS ({_DOCWORDS_SQL}),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
    stats AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY word
    ),
    ranked AS (
      SELECT word, doc_id,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY doc_id) AS rk
      FROM tf
    ),
    heads AS (
      SELECT word, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM ranked WHERE rk <= {POSTINGS_CAP} GROUP BY word
    )
    SELECT s.word, s.df, s.total_tf, h.postings
    FROM stats s JOIN heads h USING (word)
"""


@query("text_inverted_index", oracle=_INVINDEX_SQL)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: per word, document frequency,
    total term frequency, and the first-{POSTINGS_CAP} posting list
    (ascending doc ids, comma-joined for a stable cross-engine value).

    The cap is enforced BEFORE list materialisation: a per-word window
    rank keeps ≤ {POSTINGS_CAP} rows per word (Spark pushes the limit
    into the shuffle via WindowGroupLimit), so no task ever holds a
    stop-word's full posting list — the standard head-of-postings
    index layout, while exact df/total_tf come from a count-only
    aggregate that never materialises lists at all. 100 TB: both
    shuffles key on word (map-side combined counts; ranked cap bounds
    per-group state); output is |vocab|-sized."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    w = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word")
    )
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("word").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    rk = Window.partitionBy("word").orderBy("doc_id")
    heads = (
        tf.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= POSTINGS_CAP)
        .groupBy("word")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(heads, "word").select("word", "df", "total_tf", "postings")


# --- hybrid retrieval: BM25 + vector search fused by RRF ---------------------

RRF_K = 60  # the standard reciprocal-rank-fusion constant
HYBRID_TOPK = 10


def _hybrid_sql() -> str:
    """Compose the REGISTERED oracles of both retrieval arms — the
    fusion oracle stays in sync with the arms by construction."""
    from kinesis_s3_spark.operators.registry import ORACLES

    return f"""
    WITH bm AS ({ORACLES["text_bm25_search"]}),
    ann0 AS ({ORACLES["ann_bruteforce_topk"]}),
    ann AS (
      SELECT vec_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
      FROM ann0
    ),
    fused AS (
      SELECT COALESCE(bm.doc_id, ann.vec_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({RRF_K} + bm.rank), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + ann.rank), 0.0), 6) AS rrf_score,
             COALESCE(bm.rank, -1) AS bm25_rank,
             COALESCE(ann.rank, -1) AS ann_rank
      FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.vec_id
    )
    SELECT doc_id, rrf_score, bm25_rank, ann_rank, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= {HYBRID_TOPK}
"""


@query("search_hybrid_rrf", oracle=None)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009): the lexical arm (BM25 top-10 for the fixed term query) and
    the dense arm (exact cosine top-10 for query vector 0, doc ids
    aligned with vec ids in the driver corpus) are fused by
    rrf(d) = sum over arms of 1/(k + rank_d), k = {RRF_K} — the
    standard production shape for combining keyword and embedding
    search without score calibration.

    Both arms ARE the registered operators (same DataFrames, same
    oracles — the fusion oracle composes their registered SQL
    verbatim, so the three stay in sync by construction). The fusion
    itself is a full outer join of two 10-row frames + one global
    top-10 — driver-trivial at any corpus size; the arms carry the
    scale story (single doc_id-shuffle BM25, broadcast-query exact
    scan baseline or any ANN variant as a drop-in)."""
    bm = text_bm25_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm_rank")
    )
    from kinesis_s3_spark.operators.ann import ann_bruteforce_topk

    # the brute-force arm returns an ordered (vec_id, cosine) top-10;
    # materialize its rank explicitly for the fusion formula
    aw = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    ann = (
        ann_bruteforce_topk(spark, sf_dir)
        .withColumn("ann_rank", F.row_number().over(aw))
        .select(F.col("vec_id").alias("doc_id"), "ann_rank")
    )
    fused = (
        bm.join(ann, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("bm_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("ann_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.coalesce(F.col("bm_rank"), F.lit(-1)).alias("bm25_rank"),
            F.coalesce(F.col("ann_rank"), F.lit(-1)).alias("ann_rank"),
        )
    )
    win = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= HYBRID_TOPK)
        .select("doc_id", "rrf_score", "bm25_rank", "ann_rank", "rank")
    )


# bind the composed oracle AFTER both arms are registered: BM25 is
# defined above; importing ann here (deferred to module end — ann has
# no dependency on search, so no cycle) forces the dense arm's
# registration regardless of who imports this module first
def _register_hybrid_oracle() -> None:
    from kinesis_s3_spark.operators import ann as _ann  # noqa: F401
    from kinesis_s3_spark.operators.registry import ORACLES

    ORACLES["search_hybrid_rrf"] = _hybrid_sql()


_register_hybrid_oracle()


# --- positional phrase search ------------------------------------------------
#
# The inverted index above answers TERM lookups; exact PHRASE queries
# ("attention is all", a benchmark title, a license header) need term
# POSITIONS — the standard positional-index self-join: occurrences of
# word1 at position p joined to occurrences of word2 at p+1 within the
# same document. This is the decontamination/boilerplate primitive for
# multi-word patterns that 5-gram hashing (curation_decontaminate)
# over-matches and single-term lookup under-matches.
#
# The phrase set is derived from the corpus itself (top PHRASE_N
# bigrams by count, count-desc then text tie-break) so hits are
# guaranteed on any corpus and the operator stays self-contained.

PHRASE_N = 3  # phrases searched
PHRASE_TOP_BIGRAMS_SQL = f"""
    bt AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    bg AS (
      SELECT t[i] || ' ' || t[i+1] AS phrase, COUNT(*) AS cnt
      FROM bt, LATERAL (SELECT unnest(range(1, greatest(len(t), 1))) AS i)
      GROUP BY phrase
    ),
    phrases AS (
      SELECT phrase FROM bg ORDER BY cnt DESC, phrase LIMIT {PHRASE_N}
    )
"""

_PHRASE_SQL = f"""
    WITH {PHRASE_TOP_BIGRAMS_SQL},
    pos AS (
      SELECT doc_id, i AS p, t[i] AS w1, t[i+1] AS w2
      FROM bt, LATERAL (SELECT unnest(range(1, greatest(len(t), 1))) AS i)
    )
    SELECT ph.phrase, pos.doc_id, COUNT(*) AS n_occurrences
    FROM phrases ph JOIN pos
      ON pos.w1 || ' ' || pos.w2 = ph.phrase
    GROUP BY ph.phrase, pos.doc_id
"""


@query("text_phrase_search", oracle=_PHRASE_SQL)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase (adjacent-bigram) search via a positional index:
    per (phrase, doc) occurrence counts for the corpus's top-3
    bigram phrases.

    Plan, in the production shape (phrases known at query time): the
    phrase list comes from ONE zip-shifted bigram count (array
    transform in-scan, map-side combined — never a positional
    self-join) collected as PHRASE_N rows; the MATCH is then two
    SELECTIVE legs of the (doc_id, pos, word) positional index — each
    leg filters to the phrases' first/second words, so the
    predicate-pushed join sides are phrase-occurrence-sized, not
    corpus-sized — joined on (doc_id, pos+1). At 100 TB the index
    build is the linear frame and the match shuffles only matching
    positions. Reference has no query surface (SURVEY §2); extends
    the retrieval family (Manning et al., IIR §2.4 positional
    postings)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("t"))
    # phrase derivation: in-scan zip-shift bigrams, one count, 3 rows out
    bigram_col = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top = (
        toks.select(F.explode(bigram_col).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("phrase"))
        .limit(PHRASE_N)
        .collect()
    )
    phrases = [r["phrase"] for r in top]  # PHRASE_N rows — bounded collect
    w1s = [p.split(" ")[0] for p in phrases]
    w2s = [p.split(" ")[1] for p in phrases]
    index = docs.select(
        "doc_id", F.posexplode(tokens(F.lower(F.col("text")))).alias("p", "w")
    )
    a = index.filter(F.col("w").isin(w1s)).select(
        "doc_id", "p", F.col("w").alias("w1")
    )
    b = index.filter(F.col("w").isin(w2s)).select(
        "doc_id", (F.col("p") - 1).alias("p"), F.col("w").alias("w2")
    )
    return (
        a.join(b, ["doc_id", "p"])
        .withColumn("phrase", F.concat_ws(" ", F.col("w1"), F.col("w2")))
        .filter(F.col("phrase").isin(phrases))
        .groupBy("phrase", "doc_id")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
