"""Graph analytics over the event stream (north-star extension;
BASELINE.json): PageRank on the event-type transition graph — the
iterative fixed-point algorithm pattern (alongside emb_kmeans and
emb_power_iteration) expressed as joins over an edge frame.

The graph: nodes = event types, edges = per-user consecutive-event
transitions weighted by count (the events_transition_matrix bigram
frame). Small here, but the PLAN is the one that scales: each
iteration is edges ⋈ ranks (ranks broadcast — they are |V|-sized) →
groupBy(dst) sum — the textbook distributed PageRank step, linear in
|E| per round with a single uniform-key shuffle. Dangling-node mass
is redistributed uniformly (the standard correction), computed as an
anti-join scalar per round.

Determinism (registry rules): per-edge contributions are rounded to
14 dp and summed as DECIMAL(28,14) so addition order cannot move the
result; each iteration's rank vector is re-rounded to 14 dp, keeping
Spark and DuckDB bit-locked round by round (power-iteration
precedent); the division n/out and products are IEEE-identical on
identical doubles.

Reference parity note: the reference (snowplow/kinesis-s3) has no
query surface (SURVEY.md §2) — this extends the engine's iterative-
algorithm repertoire for behavioral/link analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

PR_DAMPING = 0.85
PR_ITERS = 3
_RDP = 14  # per-round rounding, decimal sum scale


def _edges_sql() -> str:
    return """
      SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type
        FROM events
      ) WHERE next_type IS NOT NULL GROUP BY 1, 2
"""


def transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n): per-user consecutive-event transitions weighted
    by count — the shared edge frame for all graph operators. One
    (user_id) window pass + one (src, dst) aggregate."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _iter_sql(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
    dang{k} AS (
      SELECT CAST(COALESCE(SUM(CAST(ROUND(p.r, {_RDP}) AS DECIMAL(28,{_RDP}))), 0)
                  AS DOUBLE) AS s
      FROM {prev} p LEFT JOIN outw o ON p.v = o.src WHERE o.src IS NULL
    ),
    inc{k} AS (
      SELECT e.dst AS v,
             CAST(SUM(CAST(ROUND(p.r * (CAST(e.n AS DOUBLE) / CAST(o.out_n AS DOUBLE)),
                                 {_RDP}) AS DECIMAL(28,{_RDP}))) AS DOUBLE) AS s
      FROM edges e JOIN {prev} p ON e.src = p.v JOIN outw o ON e.src = o.src
      GROUP BY e.dst
    ),
    r{k} AS (
      SELECT nodes.v,
             ROUND((1.0 - {PR_DAMPING}) / nn.n
                   + {PR_DAMPING} * (COALESCE(inc{k}.s, 0.0) + dang{k}.s / nn.n),
                   {_RDP}) AS r
      FROM nodes CROSS JOIN nn CROSS JOIN dang{k}
      LEFT JOIN inc{k} ON nodes.v = inc{k}.v
    )"""


_PAGERANK_SQL = (
    f"""
    WITH edges AS ({_edges_sql()}),
    outw AS (SELECT src, CAST(SUM(n) AS BIGINT) AS out_n FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT event_type AS v FROM events),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT v, ROUND(1.0 / nn.n, {_RDP}) AS r FROM nodes CROSS JOIN nn),"""
    + ",".join(_iter_sql(k) for k in range(1, PR_ITERS + 1))
    + f"""
    SELECT v AS event_type, ROUND(r, 6) AS pagerank,
           ROW_NUMBER() OVER (ORDER BY r DESC, v) AS rank
    FROM r{PR_ITERS}
"""
)


@query("graph_pagerank", oracle=_PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITERS}-iteration damped PageRank (d={PR_DAMPING}) over the
    event-type transition graph, with uniform dangling-mass
    redistribution; ranks ordered desc with node tie-break. The
    DuckDB oracle unrolls every iteration in one WITH chain —
    bit-exact per round via the module's rounding discipline.

    Plan per iteration: ranks (|V| rows, broadcast) join the cached
    edge frame, per-edge contributions aggregate on dst (uniform key,
    map-side combined), plus an anti-join scalar for dangling mass.
    100 TB: |E| scales with the corpus, each round stays one shuffle
    on dst; ranks never exceed |V| — the exact shape GraphX/Pregel
    lowers to.

    Lineage discipline: the rank vector is materialized per round via
    an eager localCheckpoint (|V| rows — event types — so the
    materialization is trivially cheap). Without it the lazily-built
    plan replays the whole prior-round lineage for each of the three
    places that consume `ranks` (dangling mass, contributions, next
    vector), i.e. ~3^k copies of the base scan by round k — the audit
    measured 166 exchanges / 22 nested loops for 3 rounds. With it,
    each round is ONE job that is linear in |E|: exactly the
    materialize-per-superstep contract GraphX/Pregel uses."""
    events = load_table(spark, sf_dir, "events")
    edges = transition_edges(spark, sf_dir).cache()
    outw = edges.groupBy("src").agg(F.sum("n").cast("long").alias("out_n"))
    nodes = events.select(F.col("event_type").alias("v")).distinct().cache()
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    dec = f"decimal(28,{_RDP})"
    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .select("v", F.round(F.lit(1.0) / F.col("n"), _RDP).alias("r"))
        .localCheckpoint(eager=True)
    )
    for _ in range(PR_ITERS):
        dang = (
            ranks.join(outw, ranks.v == outw.src, "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("r"), _RDP).cast(dec)), F.lit(0).cast(dec)
                )
                .cast("double")
                .alias("s")
            )
        )
        inc = (
            edges.join(F.broadcast(ranks.withColumnRenamed("v", "src")), "src")
            .join(outw, "src")
            .select(
                F.col("dst").alias("v"),
                F.round(
                    F.col("r")
                    * (F.col("n").cast("double") / F.col("out_n").cast("double")),
                    _RDP,
                ).cast(dec).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang.withColumnRenamed("s", "dang_s")))
            .join(F.broadcast(inc), "v", "left")
            .select(
                "v",
                F.round(
                    F.lit((1.0 - PR_DAMPING)) / F.col("n")
                    + F.lit(PR_DAMPING)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dang_s") / F.col("n")
                    ),
                    _RDP,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    win = Window.orderBy(F.col("r").desc(), "v")
    return ranks.select(
        F.col("v").alias("event_type"),
        F.round("r", 6).alias("pagerank"),
        F.row_number().over(win).alias("rank"),
    )


# --- triangle counting -------------------------------------------------------

_TRIANGLES_SQL = f"""
    WITH edges AS ({_edges_sql()}),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_node AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY v
    )
    SELECT n.v AS event_type, COALESCE(p.n_triangles, 0) AS n_triangles
    FROM (SELECT DISTINCT event_type AS v FROM events) n
    LEFT JOIN per_node p ON n.v = p.v
"""


@query("graph_triangles", oracle=_TRIANGLES_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected event-transition
    graph — the clustering-structure primitive (community density,
    spam/bot subgraph detection) next to PageRank's centrality.

    Plan: canonicalize each edge to (a < b) and dedupe; enumerate
    wedges with ONE equi-join on the shared middle vertex (e1.b =
    e2.a, which under canonical ordering yields exactly the x < y < z
    orientation), then close them against the edge list with a second
    equi-join — every triangle is produced exactly once, no cartesian
    anywhere. Per-node counts are an explode + count. 100 TB: this is
    the standard ordered-wedge MR triangle algorithm; wedge volume is
    sum_v deg(v)^2, controlled by the canonical orientation pushing
    high-degree vertices to the wedge tails, and every join keys on
    vertex ids."""
    edges = transition_edges(spark, sf_dir)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .cache()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    # one explode instead of a 3-way unionAll: the union form would
    # re-execute the two triangle joins once per branch
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    events = load_table(spark, sf_dir, "events")
    nodes = events.select(F.col("event_type").alias("v")).distinct()
    return (
        nodes.join(per_node, "v", "left")
        .select(
            F.col("v").alias("event_type"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        )
    )
