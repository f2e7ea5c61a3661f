"""Trainable quality classifier (north-star extension; no reference
analogue): batch-gradient-descent logistic regression over cheap
document features — the engine's stand-in for the fasttext-style
quality filter every LLM curation pipeline trains and applies at
corpus scale (CCNet / GPT-3 appendix A quality scoring).

Model: y = P(lang = 'en') from f1 = n_chars/1000 and f2 = chars per
whitespace token, both z-score standardized (moments computed
engine-side as decimal sums, rounded 6 — standardization is what lets
full-batch GD at lr = 1 converge instead of oscillating). Three GD
steps; the weight vector is a broadcast literal per round exactly like
emb_power_iteration's v and emb_kmeans' centroids — the iterative-
algorithm pattern this engine uses for all driver-small state.

Determinism (registry rule): per-row gradient terms cast to
DECIMAL(38,12) before summing; moments, standardized features,
gradients, and weights all ROUND 6, so the DuckDB oracle unrolls the
standardization AND all three steps bit-exactly.

Scale: the moments pass and each GD step shuffle a fixed handful of
partial sums per task (map-side combine), independent of corpus size;
steps are the convergence budget. At 100 TB the plan per step is one
columnar scan — the same shape Spark MLlib's LogisticRegression
aggregates, expressed declaratively and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.ranking import global_prefix_sum
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

LR_ROUNDS = 3
_DEC = "decimal(38,12)"

_RAW_SQL = r"""
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) / 1000 AS f1,
             CAST(n_chars AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')) AS f2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
"""

_STATS_SQL = """
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM raw),
    st1 AS MATERIALIZED (
      SELECT
        ROUND(CAST(SUM(CAST(f1 AS DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn), 6) AS m1,
        ROUND(CAST(SUM(CAST(f2 AS DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn), 6) AS m2,
        CAST(SUM(CAST(f1 * f1 AS DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn) AS q1,
        CAST(SUM(CAST(f2 * f2 AS DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn) AS q2
      FROM raw
    ),
    st2 AS MATERIALIZED (
      SELECT m1, m2,
             ROUND(sqrt(q1 - m1 * m1), 6) AS s1,
             ROUND(sqrt(q2 - m2 * m2), 6) AS s2
      FROM st1
    ),
    d AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN (SELECT s1 FROM st2) = 0 THEN NULL
                  ELSE ROUND((f1 - (SELECT m1 FROM st2)) / (SELECT s1 FROM st2), 6)
                  END AS f1,
             CASE WHEN (SELECT s2 FROM st2) = 0 THEN NULL
                  ELSE ROUND((f2 - (SELECT m2 FROM st2)) / (SELECT s2 FROM st2), 6)
                  END AS f2,
             y
      FROM raw
    )
"""

# one GD step in SQL: p under the previous weights, per-component
# decimal-summed gradients / n, weight update + grad norm at 6 dp
_LR_STEP_SQL = """
    g{k} AS MATERIALIZED (
      SELECT
        ROUND(CAST(SUM(CAST((1 / (1 + exp(0 - ({z}))) - y) AS DECIMAL(38,12)))
              AS DOUBLE) / (SELECT n FROM nn), 6) AS g0,
        ROUND(CAST(SUM(CAST((1 / (1 + exp(0 - ({z}))) - y) * f1 AS DECIMAL(38,12)))
              AS DOUBLE) / (SELECT n FROM nn), 6) AS g1,
        ROUND(CAST(SUM(CAST((1 / (1 + exp(0 - ({z}))) - y) * f2 AS DECIMAL(38,12)))
              AS DOUBLE) / (SELECT n FROM nn), 6) AS g2
      FROM d
    ),
    w{k} AS MATERIALIZED (
      SELECT {k} AS step,
             ROUND({w0} - g0, 6) AS w0,
             ROUND({w1} - g1, 6) AS w1,
             ROUND({w2} - g2, 6) AS w2,
             ROUND(sqrt(g0 * g0 + g1 * g1 + g2 * g2), 6) AS grad_norm
      FROM g{k}
    )
"""


def _w_ref(k: int, j: int) -> str:
    return f"(SELECT w{j} FROM w{k})"


def _lr_chain() -> str:
    parts = [f"WITH raw AS MATERIALIZED ({_RAW_SQL}),", _STATS_SQL + ","]
    steps = []
    for k in range(1, LR_ROUNDS + 1):
        if k == 1:
            z, w0, w1, w2 = "0", "0", "0", "0"
        else:
            w0, w1, w2 = (_w_ref(k - 1, j) for j in range(3))
            z = f"{w0} + {w1} * f1 + {w2} * f2"
        steps.append(_LR_STEP_SQL.format(k=k, z=z, w0=w0, w1=w1, w2=w2))
    return "\n".join(parts) + ",".join(steps)


_LR_SQL = (
    _lr_chain()
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT step, w0, w1, w2, grad_norm FROM w{k}" for k in range(1, LR_ROUNDS + 1)
    )
)

_FINAL = f"w{LR_ROUNDS}"
_LR_SCORES_SQL = (
    _lr_chain()
    + f"""
    SELECT doc_id,
           ROUND(1 / (1 + exp(0 - ((SELECT w0 FROM {_FINAL})
                                   + (SELECT w1 FROM {_FINAL}) * f1
                                   + (SELECT w2 FROM {_FINAL}) * f2))), 6) AS score,
           CAST(y AS BIGINT) AS label
    FROM d
    ORDER BY score DESC, doc_id
    LIMIT 10
"""
)


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (F.col("n_chars").cast("double") / 1000).alias("f1"),
        (
            F.col("n_chars").cast("double")
            / F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("f2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z-score-standardized features: one moments pass (decimal sums
    collected driver-side — 5 floats), then a map-side projection with
    the moments as literals."""
    raw = _raw(spark, sf_dir).cache()
    row = raw.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("f1").cast(_DEC)).cast("double").alias("sf1"),
        F.sum(F.col("f2").cast(_DEC)).cast("double").alias("sf2"),
        F.sum((F.col("f1") * F.col("f1")).cast(_DEC)).cast("double").alias("q1"),
        F.sum((F.col("f2") * F.col("f2")).cast(_DEC)).cast("double").alias("q2"),
    ).collect()[0]
    n = row["n"]
    m1, m2 = round(row["sf1"] / n, 6), round(row["sf2"] / n, 6)
    s1 = round((row["q1"] / n - m1 * m1) ** 0.5, 6)
    s2 = round((row["q2"] / n - m2 * m2) ** 0.5, 6)
    # zero-variance guard (ADVICE r5): a constant feature makes s = 0 —
    # Spark's Divide NULLs on /0 while DuckDB IEEE-divides to ±inf, so
    # pin NULL on both sides (the oracle's CASE WHEN s = 0 mirror)
    def _z(col: str, m: float, s: float) -> F.Column:
        if s == 0:
            return F.lit(None).cast("double")
        return F.round((F.col(col) - F.lit(m)) / F.lit(s), 6)

    return raw.select(
        "doc_id",
        _z("f1", m1, s1).alias("f1"),
        _z("f2", m2, s2).alias("f2"),
        "y",
    )


def _sigmoid(z: F.Column) -> F.Column:
    return 1 / (1 + F.exp(0 - z))


def train_lr(d: DataFrame) -> list[tuple[int, float, float, float, float]]:
    """Run LR_ROUNDS full-batch GD steps; returns the per-step
    (step, w0, w1, w2, grad_norm) trajectory. One scan + one 3-cell
    aggregate collect per step — driver state is 4 floats."""
    d = d.cache()
    n = float(d.count())
    w = [0.0, 0.0, 0.0]
    out = []
    for k in range(1, LR_ROUNDS + 1):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("f1") + F.lit(w[2]) * F.col("f2")
        resid = _sigmoid(z) - F.col("y")

        def g(term: F.Column) -> F.Column:
            return F.round(F.sum(term.cast(_DEC)).cast("double") / F.lit(n), 6)

        row = d.agg(
            g(resid).alias("g0"),
            g(resid * F.col("f1")).alias("g1"),
            g(resid * F.col("f2")).alias("g2"),
        ).collect()[0]
        gs = [float(row["g0"]), float(row["g1"]), float(row["g2"])]
        # weights already at 6 dp and lr=1, so the update stays exact;
        # round() here mirrors the oracle's ROUND for parity only
        w = [round(wi - gi, 6) for wi, gi in zip(w, gs)]
        norm = round(sum(gi * gi for gi in gs) ** 0.5, 6)
        out.append((k, w[0], w[1], w[2], norm))
    d.unpersist()
    return out


@query("curation_quality_lr", oracle=_LR_SQL)
def curation_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training trajectory (module docstring): one row per GD
    step with the post-update weights and gradient norm. The norm
    shrinking across the gated rows is the convergence evidence
    (asserted monotone in tests)."""
    rows = train_lr(_features(spark, sf_dir))
    return spark.createDataFrame(
        rows, "step int, w0 double, w1 double, w2 double, grad_norm double"
    )


@query("curation_quality_lr_scores", oracle=_LR_SCORES_SQL)
def curation_quality_lr_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained classifier: per-doc quality score
    sigmoid(w·x) under the step-{LR_ROUNDS} weights, top 10 by
    (score desc, doc_id). Scoring is a pure map-side projection — the
    deployment path for a 100 TB corpus is exactly this scan with the
    weights as a broadcast literal, followed by the quality-threshold
    filter (compare curation_ccnet_buckets)."""
    d = _features(spark, sf_dir)
    w = train_lr(d)[-1]
    z = F.lit(w[1]) + F.lit(w[2]) * F.col("f1") + F.lit(w[3]) * F.col("f2")
    return (
        d.select(
            "doc_id",
            F.round(_sigmoid(z), 6).alias("score"),
            F.col("y").cast("long").alias("label"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


_LR_AUC_SQL = (
    _lr_chain()
    + f""",
    scored AS MATERIALIZED (
      SELECT doc_id, y,
             ROUND(1 / (1 + exp(0 - ((SELECT w0 FROM {_FINAL})
                                     + (SELECT w1 FROM {_FINAL}) * f1
                                     + (SELECT w2 FROM {_FINAL}) * f2))), 6) AS score
      FROM d
    ),
    ranked AS (
      -- midranks (RANK + tie-count adjustment) so ties contribute 0.5,
      -- the Mann-Whitney convention
      SELECT y,
             RANK() OVER (ORDER BY score)
               + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS r
      FROM scored
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN y = 1 THEN r END) AS DOUBLE) AS rpos,
             CAST(SUM(y) AS BIGINT) AS n1,
             CAST(SUM(1 - y) AS BIGINT) AS n0
      FROM ranked
    )
    SELECT n1, n0,
           ROUND((rpos - n1 * (n1 + 1) / 2.0) / (n1 * n0), 6) AS auc
    FROM agg
"""
)


@query("curation_quality_lr_auc", oracle=_LR_AUC_SQL)
def curation_quality_lr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the trained quality classifier with ROC AUC via the
    Mann-Whitney rank statistic: AUC = (Σ ranks of positives −
    n1(n1+1)/2) / (n1·n0), midranks for score ties — the eval harness
    a real curation pipeline runs before trusting a filter (GPT-3
    appendix A reports exactly this check for its quality classifier).
    AUC > 0.5 says the classifier orders the classes better than
    chance even when the 1-D mean separation looks tiny.

    Scale: scoring is map-side; the rank statistic needs only
    PER-SCORE-GROUP aggregates — RANK() of a group's rows is
    1 + (#rows with a strictly smaller score) and the midrank is
    cnt_less + (cnt+1)/2, so the whole window collapses to a groupBy
    on score plus a distributed exclusive prefix sum over the group
    counts (ranking.global_prefix_sum: range-bucketed, broadcast
    offsets — no single-partition sort anywhere in the plan). Every
    midrank term is a half-integer, exact in doubles, so the sum is
    order-independent and the gate stays bit-identical."""
    d = _features(spark, sf_dir)
    w = train_lr(d)[-1]
    z = F.lit(w[1]) + F.lit(w[2]) * F.col("f1") + F.lit(w[3]) * F.col("f2")
    scored = d.select("y", F.round(_sigmoid(z), 6).alias("score"))
    groups = scored.groupBy("score").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("n1g"),
    )
    ranked = global_prefix_sum(
        groups, F.col("score"), [F.col("score")], "cnt", "cnt_less"
    ).withColumn("r", F.col("cnt_less") + (F.col("cnt") + 1) / 2.0)
    agg = ranked.agg(
        F.sum(F.col("n1g") * F.col("r")).cast("double").alias("rpos"),
        F.sum("n1g").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1g")).cast("long").alias("n0"),
    )
    return agg.select(
        "n1",
        "n0",
        F.round(
            (F.col("rpos") - F.col("n1") * (F.col("n1") + 1) / 2.0)
            / (F.col("n1") * F.col("n0")),
            6,
        ).alias("auc"),
    )


_LR_CALIB_SQL = (
    _lr_chain()
    + f""",
    scored AS MATERIALIZED (
      SELECT doc_id, y,
             ROUND(1 / (1 + exp(0 - ((SELECT w0 FROM {_FINAL})
                                     + (SELECT w1 FROM {_FINAL}) * f1
                                     + (SELECT w2 FROM {_FINAL}) * f2))), 6) AS score
      FROM d
    ),
    b AS (
      SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bucket, score, y
      FROM scored
    ),
    per AS (
      SELECT bucket, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_score,
             ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
      FROM b GROUP BY bucket
    ),
    g AS (SELECT *, ROUND(ABS(mean_score - pos_rate), 6) AS gap FROM per),
    t AS (
      SELECT ROUND(CAST(SUM(CAST(n * gap AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE), 6) AS ece
      FROM g
    )
    SELECT g.bucket, CAST(g.n AS BIGINT) AS n, g.mean_score, g.pos_rate, g.gap,
           t.ece
    FROM g CROSS JOIN t
"""
)


@query("curation_quality_lr_calibration", oracle=_LR_CALIB_SQL)
def curation_quality_lr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the trained
    quality classifier: scores bucketed into deciles (cap at 9 so
    score=1.0 joins the top bin), per-bin mean predicted probability
    vs observed positive rate, per-bin |gap|, and the n-weighted ECE —
    the standard check before a score threshold becomes a keep/drop
    policy (an uncalibrated 0.9 is not a 90 % keep-quality promise).
    Completes the LR suite: train (curation_quality_lr) → score
    (_scores) → discriminate (_auc) → calibrate (this).

    Scale: scoring is the same map-side projection as the scores
    query; the calibration itself is one groupBy over TEN buckets
    (map-side combined to ≤10 partials per task) and a 1-row ECE
    broadcast — report cost is fixed at any corpus size. Mean scores
    go through DECIMAL(18,6) (order-free); n·gap is exact at 6 dp
    since n is integral."""
    d = _features(spark, sf_dir)
    w = train_lr(d)[-1]
    z = F.lit(w[1]) + F.lit(w[2]) * F.col("f1") + F.lit(w[3]) * F.col("f2")
    scored = d.select(
        F.round(_sigmoid(z), 6).alias("score"), F.col("y").cast("long").alias("y")
    )
    per = (
        scored.select(
            F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9)).alias(
                "bucket"
            ),
            "score",
            "y",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
            F.round(F.sum("y").cast("double") / F.count("*"), 6).alias("pos_rate"),
        )
        .withColumn(
            "gap", F.round(F.abs(F.col("mean_score") - F.col("pos_rate")), 6)
        )
    )
    t = F.broadcast(
        per.agg(
            F.round(
                F.sum((F.col("n") * F.col("gap")).cast("decimal(18,6)")).cast("double")
                / F.sum("n").cast("double"),
                6,
            ).alias("ece")
        )
    )
    return per.crossJoin(t).select(
        "bucket", "n", "mean_score", "pos_rate", "gap", "ece"
    )
