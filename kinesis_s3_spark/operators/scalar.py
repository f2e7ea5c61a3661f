"""Scalar-function library parity + statistical aggregates.

The reference's scalar surface is five functions (SURVEY §2: O6, O7,
O12, O13, O16); everything here is the engine's full function library
— string, date, math, array, JSON, conditional — each family as one
oracle-checked query so the inventory is auditable.

Determinism notes:
- transcendentals (ln/exp/pow) are rounded to 6 dp on both engines
  (libm last-ulp differences live at 1e-16);
- sqrt/abs/floor/ceil/sign/mod are IEEE-exact — no rounding;
- stddev/var/corr are computed from DECIMAL sums via the explicit
  algebraic formulas, so addition order can't change the result
  (built-in stddev aggregates are order-sensitive in the last bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

DEC = "decimal(18,6)"


@query(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substr(p_name, 3, 8) AS sub_name,
           replace(p_type, 'ECONOMY', 'ECO') AS repl_type,
           concat_ws('|', p_brand, p_type) AS joined,
           length(p_name) AS name_len,
           reverse(p_brand) AS rev_brand,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           CASE WHEN contains(p_type, 'SMALL') THEN 1 ELSE 0 END AS is_small,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           trim(concat('  ', p_brand, '  ')) AS trimmed,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 3, 8).alias("sub_name"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("repl_type"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.length("p_name").alias("name_len"),
        F.reverse("p_brand").alias("rev_brand"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.when(F.col("p_type").contains("SMALL"), 1).otherwise(0).alias("is_small"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@query(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           o_orderdate + INTERVAL 30 DAY AS plus_30d,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders (ISO day-of-week bridges
    the Spark/DuckDB numbering difference: weekday()+1 == isodow)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_v,
           CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ceil_v,
           CAST(floor(l_extendedprice / 100) AS BIGINT) AS floor_v,
           round(l_extendedprice * l_tax, 4) AS round_v,
           sqrt(l_quantity) AS sqrt_v,
           ROUND(ln(l_extendedprice + 1), 6) AS ln_v,
           ROUND(exp(l_discount), 6) AS exp_v,
           ROUND(pow(l_quantity, 2), 6) AS pow_v,
           CAST(l_quantity AS BIGINT) % 7 AS mod_v,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.ceil(F.col("l_extendedprice") / 100).cast("long").alias("ceil_v"),
        F.floor(F.col("l_extendedprice") / 100).cast("long").alias("floor_v"),
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("round_v"),
        F.sqrt("l_quantity").alias("sqrt_v"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_v"),
        F.round(F.exp("l_discount"), 6).alias("exp_v"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("pow_v"),
        (F.col("l_quantity").cast("long") % 7).alias("mod_v"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_v"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_array_suite",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           array_to_string(toks[1:3], '-') AS head3,
           CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark,
           CAST(list_position(toks, 'table') AS INT) AS table_pos,
           list_sort(list_distinct(toks))[1] AS min_tok
    FROM t
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection function family over tokenized documents
    (size, distinct, indexing, slice, contains, position, sort)."""
    from kinesis_s3_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn("toks", tokens(F.lower(F.col("text"))))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.get(F.col("toks"), 0).alias("first_tok"),
        F.get(F.col("toks"), F.size("toks") - 1).alias("last_tok"),
        F.array_join(F.slice("toks", 1, 3), "-").alias("head3"),
        F.when(F.array_contains("toks", "spark"), 1).otherwise(0).alias("has_spark"),
        F.array_position("toks", "table").cast("int").alias("table_pos"),
        F.get(F.array_sort(F.array_distinct("toks")), 0).alias("min_tok"),
    )


@query(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           concat('{"event":"', event_type, '","k":',
                  json_extract_string(props, '$.k'), '}') AS rebuilt,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function family over events.props: extract, rebuild,
    validate — schema-on-read exactly like the reference's
    self-describing JSON handling (Common.scala:62-70)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.concat(
            F.lit('{"event":"'),
            F.col("event_type"),
            F.lit('","k":'),
            F.get_json_object("props", "$.k"),
            F.lit("}"),
        ).alias("rebuilt"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'RESIDENTIAL') AS segment_or_res,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_tier,
           IF(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
    FROM customer
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: coalesce/nullif/case/if."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("RESIDENTIAL")).alias(
            "segment_or_res"
        ),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
    )


@query(
    "agg_stats_suite",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS p1,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((s2 - s1 * s1 / n) / (n - 1), 6) AS var_qty,
           ROUND(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS stddev_qty,
           ROUND((sp - s1 * p1 / n) / (n - 1), 6) AS covar_qty_price
    FROM s
    """,
)
def agg_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev/covariance from exact decimal power sums
    (the algebraic identities) — order-independent across engines,
    unlike naive built-in stddev over doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast(DEC)).cast("double").alias("s1"),
        F.sum((q * q).cast(DEC)).cast("double").alias("s2"),
        F.sum(p.cast(DEC)).cast("double").alias("p1"),
        F.sum((q * p).cast(DEC)).cast("double").alias("sp"),
    )
    n = F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
    covar = (F.col("sp") - F.col("s1") * F.col("p1") / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(covar, 6).alias("covar_qty_price"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           ROUND(quantile_disc(o_totalprice, 0.5), 4) AS median_disc,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous + discrete): Spark's percentile()
    uses the same linear interpolation as quantile_cont. Scale note:
    exact percentile sorts per group — for heavy groups the
    approx_percentile twin (t-digest) is the streaming/huge-group
    path (kept out of the oracle set because approximations are
    engine-specific)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 4).alias("median_disc"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_skew_salted",
    oracle="""
    WITH salted AS (
      SELECT l_returnflag, CAST(l_orderkey % 8 AS INT) AS salt,
             l_quantity
      FROM lineitem
    ),
    partial AS (
      SELECT l_returnflag, salt, COUNT(*) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
      FROM salted GROUP BY l_returnflag, salt
    )
    SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS cnt,
           CAST(SUM(sq) AS DOUBLE) AS sum_qty
    FROM partial GROUP BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: salt the hot key
    space (8 shards), partial-aggregate per (key, salt), then merge.
    l_returnflag has only 3 values — exactly the pathological
    cardinality where a direct groupBy funnels everything through 3
    reducers at 100 TB. Decimal partials keep the merge order-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag",
        (F.col("l_orderkey") % 8).cast("int").alias("salt"),
        "l_quantity",
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sq").cast("double").alias("sum_qty"),
    )


@query(
    "fn_map_suite",
    oracle="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           CAST(props->>'k' AS BIGINT) AS k_val,
           array_to_string(list_sort(list_append(json_keys(props), 'uid')), ',')
             AS merged_keys,
           CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 1 ELSE 0 END
             + CASE WHEN user_id > 50 THEN 1 ELSE 0 END AS n_big_vals
    FROM events
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: from_json to MapType, map_keys /
    element_at / create_map / map_concat / map_filter — the map-column
    surface SURVEY §2's scalar inventory lists next to array/json.

    The oracle states the same semantics over the raw JSON (DuckDB maps
    are keyed differently), so the gate checks VALUES while the Spark
    side exercises the real map operators."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    withm = e.select(
        "event_id",
        "user_id",
        m.alias("m"),
        F.map_concat(
            m, F.create_map(F.lit("uid"), F.col("user_id").cast("bigint"))
        ).alias("m2"),
    )
    return withm.select(
        "event_id",
        F.size("m").cast("long").alias("n_keys"),
        F.element_at("m", "k").alias("k_val"),
        F.concat_ws(",", F.array_sort(F.map_keys("m2"))).alias("merged_keys"),
        F.size(F.map_filter("m2", lambda _, v: v > 50)).cast("long").alias("n_big_vals"),
    )


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & o_custkey AS b_and,
           o_orderkey | o_custkey AS b_or,
           xor(o_orderkey, o_custkey) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr,
           bit_count(o_orderkey) AS b_pop,
           ~o_orderkey AS b_not
    FROM orders
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (AND/OR/XOR/shifts/popcount/NOT) —
    pure codegen expressions; these are the primitives the simhash and
    pigeonhole-blocking operators build on."""
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(c).alias("b_and"),
        k.bitwiseOR(c).alias("b_or"),
        k.bitwiseXOR(c).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bit_count(k).alias("b_pop"),
        F.bitwise_not(k).alias("b_not"),
    )


@query(
    "fn_struct_suite",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'cust': o_custkey, 'status': o_orderstatus,
              'money': {'total': o_totalprice, 'prio': o_orderpriority}} AS info
      FROM orders
    )
    SELECT o_orderkey,
           info.cust AS cust,
           info.money.total AS total,
           upper(info.status) || ':' || info.money.prio AS status_prio,
           CASE WHEN info.money.total > 100000 THEN 'big' ELSE 'small' END AS bucket
    FROM s
    """,
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct function family: nested struct construction, dotted
    field access through two levels, and expressions over extracted
    fields — the column-shape every typed event/enriched payload uses.
    Pure projection: struct build + access fuses into the scan (no
    shuffle, no serialization — Catalyst collapses CreateStruct /
    GetStructField pairs at optimization time)."""
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_totalprice").alias("total"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("money"),
        ).alias("info"),
    )
    return s.select(
        "o_orderkey",
        F.col("info.cust").alias("cust"),
        F.col("info.money.total").alias("total"),
        F.concat(
            F.upper(F.col("info.status")), F.lit(":"), F.col("info.money.prio")
        ).alias("status_prio"),
        F.when(F.col("info.money.total") > 100000, F.lit("big"))
        .otherwise(F.lit("small"))
        .alias("bucket"),
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT s.s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join template for skewed fact keys: the fact side gets a
    deterministic salt (l_orderkey % 8), the dimension side is
    exploded 8× with every salt value, and the join runs on
    (suppkey, salt) — a hot supplier's rows now land on 8 reducers
    instead of one. The oracle is the PLAIN join + aggregate, so the
    gate proves the rewrite is semantics-preserving, which is the
    whole point of the template.

    At 100 TB this is the manual fallback when AQE's skew-join split
    can't help (e.g. skew in a broadcast-ineligible dim after ETL, or
    pre-AQE engines); the dim-side 8× blowup is bounded by
    |dim| × SALT, trivial next to the fact shuffle it balances.
    Decimal partial sums keep the merged aggregate order-exact."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_extendedprice",
        (F.col("l_orderkey") % SALT).cast("int").alias("salt"),
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)])))
    )
    joined = li.join(sup, (li["l_suppkey"] == sup["s_suppkey"]) & (li["salt"] == sup["salt"]))
    return joined.groupBy("s_nationkey").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
    )


@query(
    "agg_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (price ~ quantity): slope,
    intercept, r² — computed from exact decimal power sums via the
    closed-form identities rather than the built-in regr_* aggregates,
    so the result is addition-order-independent (the same reason
    agg_stats_suite avoids naive stddev). One groupBy, five shared
    sums, map-side combined; the identities run on the |groups|-row
    aggregate frame."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    BIG = "decimal(38,6)"
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((y * y).cast(BIG)).cast("double").alias("syy"),
        F.sum((x * y).cast(BIG)).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "fn_lambda_suite",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(e, x -> abs(x) > 2.0)) > 0 AS any_big,
           len(list_filter(e, x -> abs(x) > 10.0)) = 0 AS all_small,
           ROUND(CAST(list_sum(list_transform(e,
                 x -> CAST(x * x AS DECIMAL(38,12)))) AS DOUBLE), 6) AS ss,
           ROUND(CAST(list_sum(list_transform(list_sort(e, 'DESC')[1:3],
                 x -> CAST(x AS DECIMAL(38,12)))) AS DOUBLE), 6) AS top3_sum,
           ROUND(CAST(list_sum(list_transform(list_zip(e, list_reverse(e)),
                 p -> CAST(p[1] * p[2] AS DECIMAL(38,12)))) AS DOUBLE), 6)
             AS rev_dot
    FROM v
    """,
)
def fn_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order (lambda) function family over the embedding
    arrays: filter, exists, forall, transform+aggregate folds, sorted
    slice, and zip_with — the Spark-side collection algebra that keeps
    per-element work inside codegen instead of exploding rows (an
    explode would shuffle |rows| x dim; these never leave the row).
    Cross-engine sums go through DECIMAL(38,12) per element (the
    embeddings.py determinism rule)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    dec = "decimal(38,12)"
    # Spark widens decimal + to (38,11); re-cast keeps the accumulator
    # type stable (embeddings.py pattern — ROUND 6 absorbs the scale)
    dec_sum = lambda arr: F.aggregate(  # noqa: E731
        arr,
        F.lit(0).cast(dec),
        lambda acc, x: (acc + x.cast(dec)).cast(dec),
    ).cast("double")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.exists(e, lambda x: F.abs(x) > 2.0).alias("any_big"),
        F.forall(e, lambda x: F.abs(x) <= 10.0).alias("all_small"),
        F.round(
            dec_sum(F.transform(e, lambda x: x * x)),
            6,
        ).alias("ss"),
        F.round(dec_sum(F.slice(F.sort_array(e, asc=False), 1, 3)), 6).alias("top3_sum"),
        F.round(
            dec_sum(F.zip_with(e, F.reverse(e), lambda x, y: x * y)),
            6,
        ).alias("rev_dot"),
    )


@query(
    "fn_try_suite",
    oracle="""
    SELECT event_id,
           TRY_CAST(props AS INT) AS props_int,
           TRY_CAST(event_type AS DOUBLE) AS type_dbl,
           TRY_CAST(substr(props, 1, 10) AS TIMESTAMP) AS props_ts,
           CASE WHEN CAST(FLOOR(value) AS BIGINT) % 3 = 0 THEN NULL
                ELSE value / (CAST(FLOOR(value) AS BIGINT) % 3) END AS safe_div,
           string_split(event_type, 'i')[2] AS part2,
           TRY_CAST(CASE WHEN event_id % 2 = 0
                         THEN CAST(event_id AS VARCHAR)
                         ELSE event_type END AS BIGINT) AS mixed_int
    FROM events
    """,
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family (the dirty-data surface): try_cast
    over genuinely unparseable strings (JSON props as INT/TIMESTAMP,
    words as DOUBLE), try_divide with a data-derived zero denominator,
    try_element_at beyond a split's length (mixed hit/miss rows) — every failure is a NULL,
    never a task abort. The oracle mirrors with TRY_CAST / CASE /
    native out-of-range list indexing, so the gate pins that both
    engines agree row-by-row on WHICH inputs are salvageable.

    Scale: pure map-side projections inside codegen; the operational
    point is that one malformed record cannot kill a 100 TB job —
    the ANSI-mode-safe ingestion idiom.
    """
    e = load_table(spark, sf_dir, "events")
    den = F.floor("value").cast("long") % 3
    return e.select(
        "event_id",
        F.expr("try_cast(props AS INT)").alias("props_int"),
        F.expr("try_cast(event_type AS DOUBLE)").alias("type_dbl"),
        F.expr("try_cast(substr(props, 1, 10) AS TIMESTAMP)").alias("props_ts"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.try_divide(F.col("value"), den))
        .alias("safe_div"),
        F.try_element_at(F.split("event_type", "i"), F.lit(2)).alias("part2"),
        F.expr(
            "try_cast(CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS STRING) "
            "ELSE event_type END AS BIGINT)"
        ).alias("mixed_int"),
    )
