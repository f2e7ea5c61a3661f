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
the oracle unrolls all rounds as a CTE chain.

Two trainers share one loop (``train_bpe_batched``):

* sequential (accept_cap=1) — classic BPE, one driver round-trip per
  merge; fine at N_MERGES=3, driver-latency-bound at a 32k vocab.
* batched (accept_cap=K) — per round, rank pairs once, collect a
  driver-sized top-M window, GREEDILY accept up to K pairwise
  SYMBOL-DISJOINT pairs (a pair is rejected if its left, right, or
  concatenated symbol was already touched by an earlier acceptance
  this round), then apply all K merges in ONE map-stage projection.
  Disjointness is what makes the batch faithful: merging (a,b) cannot
  change the count of (c,d) when the symbol sets are disjoint and the
  new symbol "ab" is untouched, so each accepted pair's pre-round
  count IS its count at its turn in the sequential application order.
  The one divergence from fully-sequential BPE — a freshly-created
  pair (x, ab) could out-count the next pre-round candidate — is the
  documented batch-BPE trade-off; accept_cap=1 recovers sequential
  semantics exactly (and ``text_bpe_train`` gates that equivalence
  against the unrolled sequential oracle).

Scale: each round is one explode→groupBy over (pairs × word-freqs)
(map-side combined, shuffle carries distinct pairs), ONE top-M
collect (M=64 rows — driver-sized, like k-means centroids), and a
map-stage segmentation rewrite. Jobs-per-merge ≈ rounds/merges: the
gated k64 run learns 64 merges in 6 rounds ≈ 0.094 driver round-trips
per merge, vs 1.0 for the sequential loop — the shape that survives a
32k-vocab budget (2k rounds, not 32k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

N_MERGES = 3

# batched-trainer parameters for the gated k64 query: 6 rounds of a
# 64-pair candidate window accepting ≤16 disjoint merges each ⇒ ≥64
# merges learned (trimmed to exactly BPE_K64_TARGET for a fixed-shape
# result), 6 driver round-trips total.
BPE_K64_TARGET = 64
BPE_K64_ROUNDS = 6
BPE_K64_ACCEPT = 16
BPE_K64_WINDOW = 64

# truncate the training state's lineage every N rounds (see
# train_bpe_batched docstring); a divisor-free stride > BPE_K64_ROUNDS
# keeps the gated k64 path on the pure cache policy it was proven on
_LINEAGE_CUT_EVERY = 8

# --- shared oracle fragments -------------------------------------------------

# word-frequency frame + initial per-character segmentation; shared by
# every BPE oracle (train, tokenize, batched) so there is exactly one
# definition of the corpus normalization.
_BPE_BASE_SQL = r"""
    w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
            FROM documents)
      WHERE word != ''
      GROUP BY word
    ),
    s0 AS (SELECT word, freq, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seg FROM w0)"""

# weighted adjacent-pair counts over segmentation frame {s}
_PAIR_SQL = """
      SELECT t.l AS l, t.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest([{{'l': toks[i], 'r': toks[i+1]}} for i in range(1, len(toks))]) AS t
        FROM (SELECT freq, string_split(seg, ' ') AS toks FROM {s})
      )
      GROUP BY t.l, t.r"""

# one SEQUENTIAL merge round: pair counts over {s} → top pair {t} →
# merged segmentations {sn}
_BPE_ROUND_SQL = (
    """
    p{k} AS ("""
    + _PAIR_SQL
    + """
    ),
    t{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
    {sn} AS (
      SELECT word, freq,
             replace(seg, (SELECT l || ' ' || r FROM t{k}), (SELECT l || r FROM t{k})) AS seg
      FROM {s}
    )"""
)

# the shared WITH-chain for the sequential N_MERGES oracles (ADVICE r4:
# built as a constant and extended by concatenation — never recovered
# by string-splitting a finished query).
_BPE_CHAIN = (
    "\n    WITH"
    + _BPE_BASE_SQL
    + ","
    + ",".join(
        _BPE_ROUND_SQL.format(k=k, s=f"s{k-1}", sn=f"s{k}") for k in range(1, N_MERGES + 1)
    )
)

_BPE_SQL = (
    _BPE_CHAIN
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {k} AS merge_rank, l, r, cnt AS pair_count FROM t{k}"
        for k in range(1, N_MERGES + 1)
    )
)

# one BATCHED merge round: pair counts → top-{window} ranked window →
# recursive greedy symbol-disjoint selection (≤{cap} accepts) →
# fold-apply every accepted merge in rank order. The recursion walks
# the ranked window one candidate per step carrying (used symbols,
# accepted "l r" strings, accepted counts); an acceptance's find
# string is "l r" and its replacement is the same string with the
# space removed, so the apply step is a single list_reduce.
# MATERIALIZED is load-bearing: without it DuckDB may inline the
# scalar subquery (SELECT acc FROM a{k}) per-row, re-running the whole
# upstream chain once per word per round — hours instead of <1 s.
_BPE_BATCH_OK = (
    "len(g.acc) < {cap} AND NOT list_contains(g.used, c.l) "
    "AND NOT list_contains(g.used, c.r) AND NOT list_contains(g.used, c.l || c.r)"
)

_BPE_BATCH_ROUND_SQL = (
    """
    p{k} AS MATERIALIZED ("""
    + _PAIR_SQL
    + """
    ),
    r{k} AS (
      SELECT l, r, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS INT) AS rk
      FROM p{k} QUALIFY rk <= {window}
    ),
    g{k} AS (
      SELECT 0 AS rk, CAST([] AS VARCHAR[]) AS used,
             CAST([] AS VARCHAR[]) AS acc, CAST([] AS BIGINT[]) AS acc_cnt
      UNION ALL
      SELECT c.rk,
             CASE WHEN {ok} THEN g.used || [c.l, c.r, c.l || c.r] ELSE g.used END,
             CASE WHEN {ok} THEN list_append(g.acc, c.l || ' ' || c.r) ELSE g.acc END,
             CASE WHEN {ok} THEN list_append(g.acc_cnt, c.cnt) ELSE g.acc_cnt END
      FROM g{k} g JOIN r{k} c ON c.rk = g.rk + 1
    ),
    a{k} AS MATERIALIZED (SELECT acc, acc_cnt FROM g{k} ORDER BY rk DESC LIMIT 1),
    {sn} AS MATERIALIZED (
      SELECT word, freq,
             list_reduce(list_prepend(seg, (SELECT acc FROM a{k})),
                         (a, m) -> replace(a, m, replace(m, ' ', ''))) AS seg
      FROM {s}
    )"""
)

_BPE_K64_SQL = (
    "\n    WITH RECURSIVE"
    + _BPE_BASE_SQL
    + ","
    + ",".join(
        _BPE_BATCH_ROUND_SQL.format(
            k=k,
            s=f"s{k-1}",
            sn=f"s{k}",
            window=BPE_K64_WINDOW,
            ok=_BPE_BATCH_OK.format(cap=BPE_K64_ACCEPT),
        )
        for k in range(1, BPE_K64_ROUNDS + 1)
    )
    + """
    SELECT merge_rank, split_part(m, ' ', 1) AS l, split_part(m, ' ', 2) AS r,
           cnt AS pair_count
    FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rnd, idx) AS INT) AS merge_rank, m, cnt
      FROM (
        """
    + "\n        UNION ALL ".join(
        f"SELECT {k} AS rnd, generate_subscripts(acc, 1) AS idx, "
        f"unnest(acc) AS m, unnest(acc_cnt) AS cnt FROM a{k}"
        for k in range(1, BPE_K64_ROUNDS + 1)
    )
    + f"""
      )
    )
    WHERE merge_rank <= {BPE_K64_TARGET}
"""
)


@query("text_bpe_train", oracle=_BPE_SQL)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first N_MERGES BPE merges over the corpus (module
    docstring): returns the merge table (merge_rank, l, r, pair_count)
    — the trained tokenizer artifact. Runs through the batched trainer
    at accept_cap=1, where it reduces exactly to classic sequential
    BPE — and the UNROLLED SEQUENTIAL oracle gates that equivalence:
    pair counting, the deterministic argmax, AND the greedy
    left-to-right merge rewrites end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, N_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, l string, r string, pair_count bigint"
    )


@query("text_bpe_train_k64", oracle=_BPE_K64_SQL)
def text_bpe_train_k64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training at a vocabulary budget the sequential loop cannot
    reach (VERDICT r4 'what's missing' #2): 64 merges in 6 driver
    round-trips via batched greedy symbol-disjoint selection (module
    docstring) — jobs-per-merge ≈ 0.094, and the same shape reaches a
    32k vocab in ~2k rounds instead of 32k. The oracle unrolls the
    IDENTICAL batched algorithm: ranked candidate windows, the greedy
    disjoint scan as a recursive CTE, and the per-round multi-merge
    rewrite as a list_reduce fold — selection order, tie-breaks, and
    counts all bit-checked."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_batched(docs, BPE_K64_ROUNDS, BPE_K64_ACCEPT, BPE_K64_WINDOW)
    return spark.createDataFrame(
        merges[:BPE_K64_TARGET], "merge_rank int, l string, r string, pair_count bigint"
    )


def _segmentations(docs: DataFrame) -> DataFrame:
    """(word, freq, seg) frame: word frequencies + per-character
    space-joined segmentation — the trainer's working state."""
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("seg", F.trim(F.regexp_replace("word", "(.)", "$1 ")))
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts (l, r, cnt) over a (freq, seg)
    frame — one explode→groupBy, map-side combined, shuffle carries
    only distinct pairs."""
    toks = F.split("seg", " ")
    return (
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
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def train_bpe(docs: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Classic sequential BPE — the batched loop at accept_cap=1
    (one candidate, one acceptance, one merge per round)."""
    return train_bpe_batched(docs, n_rounds=n_merges, accept_cap=1, window=1)


def train_bpe_batched(
    docs: DataFrame,
    n_rounds: int,
    accept_cap: int,
    window: int,
    target_merges: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """The batched training loop (module docstring) — returns the
    learned merge table [(rank, l, r, weighted_pair_count), ...] in
    acceptance order. Per round: ONE pair-count job + top-``window``
    collect (driver-sized), greedy symbol-disjoint acceptance of up to
    ``accept_cap`` pairs, and one chained-replace projection applying
    them all.

    ``target_merges``: stop as soon as that many merges are learned
    (rounds late in training accept fewer than ``accept_cap`` when the
    candidate window runs short of disjoint pairs, so a fixed round
    count under-delivers at large budgets); the result is trimmed to
    exactly the target.

    Large-budget hygiene (the 1k-merge experiment's findings,
    SCALE.md): the parent round's cache is released only AFTER the
    current round's collect has materialized the child (dropping it
    before would recompute the whole replace chain from scratch every
    round — quadratic), and every ``_LINEAGE_CUT_EVERY`` rounds the
    state is localCheckpoint'ed so the logical plan stays shallow
    instead of accreting one replace-chain per round (analysis time
    otherwise grows with round² at vocab-scale budgets)."""
    cur = _segmentations(docs).cache()
    prev = None
    merges: list[tuple[str, str, int]] = []
    for rnd in range(n_rounds):
        if target_merges is not None and len(merges) >= target_merges:
            break
        top = (
            _pair_counts(cur)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(window)
            .collect()
        )
        # cur is materialized now; its parent's cache is safe to drop
        if prev is not None:
            prev.unpersist()
            prev = None
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for row in top:
            if len(accepted) >= accept_cap:
                break
            left, right = row["l"], row["r"]
            syms = {left, right, left + right}
            if used & syms:
                continue
            used |= syms
            accepted.append((left, right, int(row["cnt"])))
        if not accepted:
            break
        seg: Column = F.col("seg")
        for left, right, _cnt in accepted:
            seg = F.replace(seg, F.lit(f"{left} {right}"), F.lit(left + right))
        nxt = cur.withColumn("seg", seg)
        if (rnd + 1) % _LINEAGE_CUT_EVERY == 0:
            # materializes nxt AND truncates lineage; parent cache can
            # go immediately since the checkpoint holds real partitions
            nxt = nxt.localCheckpoint(eager=True)
            cur.unpersist()
        else:
            nxt = nxt.cache()
            prev = cur
        cur = nxt
        merges.extend(accepted)
    cur.unpersist()
    if prev is not None:
        prev.unpersist()
    if target_merges is not None:
        merges = merges[:target_merges]
    return [(i + 1, left, right, cnt) for i, (left, right, cnt) in enumerate(merges)]


# --- apply the learned merges back to the corpus -----------------------------

# train chain + per-word replace chain, WITHOUT a final select — the
# shared prefix of text_bpe_tokenize and text_bpe_fertility (factored
# per the ADVICE r4 rule: build SQL from named parts, never by
# splitting a finished string)
_BPE_APPLY_CHAIN = (
    _BPE_CHAIN
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
)

_BPE_TOKENIZE_SQL = (
    _BPE_APPLY_CHAIN
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


_BPE_FERTILITY_SQL = (
    _BPE_APPLY_CHAIN
    + f""",
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(len(string_split(seg, ' '))) AS BIGINT) AS n_symbols
      FROM d{N_MERGES} GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_symbols) AS BIGINT) AS n_symbols,
           CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
           ROUND(100.0 * SUM(p.n_symbols) / SUM(d.n_chars), 6) AS symbols_per_100_chars
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
"""
)


@query("text_bpe_fertility", oracle=_BPE_FERTILITY_SQL)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: symbols per 100 characters
    under the learned merge table — the metric that tells you a
    tokenizer trained on one language mix punishes another (high
    fertility = more tokens per text = higher serving cost and
    shorter effective context for that language). Composes the same
    train → apply chain as text_bpe_tokenize and rolls it up per
    lang; the oracle re-runs the whole chain so the gate checks the
    composition end-to-end.

    Scale: training as text_bpe_train; application is a map stage
    (merge-table expression literals); the rollup is a groupBy on the
    tiny lang key (map-side combined)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, N_MERGES)
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    seg = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    for _rank, left, right, _cnt in merges:
        seg = F.replace(seg, F.lit(f"{left} {right}"), F.lit(left + right))
    per_doc = (
        words.select("doc_id", F.size(F.split(seg, " ")).alias("n_sym"))
        .groupBy("doc_id")
        .agg(F.sum("n_sym").cast("long").alias("n_symbols"))
    )
    return (
        per_doc.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_symbols").cast("long").alias("n_symbols"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.round(
                100.0 * F.sum("n_symbols") / F.sum("n_chars"), 6
            ).alias("symbols_per_100_chars"),
        )
    )
