"""Relational surface, batch 2 — pivot, as-of join, percentiles, exact
variance, string/conditional aggregation, navigation windows, null semantics,
correlated subqueries, CTE pipelines (SURVEY B2-B8 completion).

Same float-determinism rules as relational.py: raw doubles for row-level
expressions, exact integer-scaled sums (``dsum``) under any aggregate that
feeds the oracle hash, identical expression trees on both engines for derived
statistics (variance from exact moments, not engine ``stddev``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ._util import t
from .relational import dsum, dsum_sql

# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


@query(
    "q_pivot",
    oracle=f"""
    SELECT o_orderpriority AS orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="aggregation",
    description="Pivot order status into columns (Spark .pivot == portable CASE aggregation; Expand+partial agg, one pass).",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    piv = (
        o.groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(cents))
    )
    return piv.select(
        "orderpriority",
        (F.col("F").cast("double") / 100).alias("f_total"),
        (F.col("O").cast("double") / 100).alias("o_total"),
        (F.col("P").cast("double") / 100).alias("p_total"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
        SELECT c_custkey,
               'acctbal'   AS metric, c_acctbal            AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) WHERE c_custkey % 25 = 0
    """,
    category="projection",
    description="Unpivot (wide→long) via stack/melt — the inverse reshaping primitive.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
    )


# ---------------------------------------------------------------------------
# As-of join (time-series: latest view before each purchase)
# ---------------------------------------------------------------------------


@query(
    "q_asof_join",
    oracle="""
    SELECT user_id, ts, last_view_ts,
           CASE WHEN last_view_ts IS NOT NULL
                THEN CAST(date_diff('second', last_view_ts, ts) AS BIGINT) END AS secs_since_view
    FROM (
        SELECT user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
        FROM events
    )
    WHERE event_type = 'purchase'
    """,
    category="join",
    description="As-of join (Spark has no native one — SURVEY/guide pattern): latest 'view' strictly before each 'purchase' per user, via a running-max window over the unioned stream instead of an O(n·m) range join.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, -1)
    last_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        e.withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "last_view_ts",
            F.when(
                F.col("last_view_ts").isNotNull(),
                (F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts")),
            ).alias("secs_since_view"),
        )
    )


# ---------------------------------------------------------------------------
# Percentiles & exact variance
# ---------------------------------------------------------------------------


@query(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority AS orderpriority,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.9)  AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="aggregation",
    description="Exact interpolated percentiles (Spark `percentile` == DuckDB quantile_cont); approx_percentile is the 100 TB variant (pytest-bounded).",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("orderpriority")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


@query(
    "q_agg_variance",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS s1,
           {dsum_sql('l_quantity * l_quantity')} AS s2,
           ({dsum_sql('l_quantity * l_quantity')}
            - {dsum_sql('l_quantity')} * {dsum_sql('l_quantity')} / COUNT(*))
           / (COUNT(*) - 1) AS var_samp_exact
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregation",
    description="Sample variance from exact integer moments (portable & order-independent — engine-native stddev would hash-mismatch on summation order).",
)
def q_agg_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    s1 = dsum("l_quantity")
    s2 = dsum(F.col("l_quantity") * F.col("l_quantity"))
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_samp_exact"),
    )


@query(
    "q_agg_stringagg",
    oracle="""
    SELECT r.r_name AS region_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    category="aggregation",
    description="Ordered string aggregation (collect_list + sort_array + concat_ws == string_agg ORDER BY).",
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "q_agg_conditional",
    oracle=f"""
    SELECT l_linestatus AS linestatus,
           COUNT(*) FILTER (WHERE l_discount > 0.05)              AS n_discounted,
           COUNT(*) FILTER (WHERE l_returnflag = 'R')             AS n_returned,
           {dsum_sql("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END")} AS bulk_revenue,
           MAX(CASE WHEN l_discount = 0 THEN l_extendedprice END) AS max_undiscounted
    FROM lineitem
    GROUP BY l_linestatus
    """,
    category="aggregation",
    description="Conditional aggregation: FILTER clauses / CASE-guarded aggs — one pass, no self-joins.",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        dsum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(0.0)).alias(
            "bulk_revenue"
        ),
        F.max(F.when(F.col("l_discount") == 0, F.col("l_extendedprice"))).alias("max_undiscounted"),
    )


# ---------------------------------------------------------------------------
# Navigation window functions
# ---------------------------------------------------------------------------


@query(
    "q_window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
           CAST(COUNT(*) OVER w AS BIGINT)  AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    category="window",
    description="first/last/nth_value over an unbounded frame — per-customer order-history navigation.",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Null semantics
# ---------------------------------------------------------------------------


@query(
    "q_scalar_null",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.o_totalprice, -1.0)                 AS price_or_default,
           NULLIF(c.c_mktsegment, 'BUILDING')             AS seg_nullif,
           (o.o_orderkey IS NULL)                         AS no_order,
           (c.c_nationkey IS NOT DISTINCT FROM o.o_custkey % 25) AS null_safe_eq
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderkey % 97 = 0
    WHERE c.c_custkey % 20 = 0
    """,
    category="scalar",
    description="Null-handling surface: COALESCE / NULLIF / IS NULL / null-safe equality (<=> vs IS NOT DISTINCT FROM) across an outer join's null-extended rows.",
)
def q_scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    j = c.join(o, o.o_custkey == c.c_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_or_default"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullif"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.col("c_nationkey").eqNullSafe(F.col("o_custkey") % 25).alias("null_safe_eq"),
    )


# ---------------------------------------------------------------------------
# Subqueries & CTE pipelines (identical ANSI SQL on both engines).
#
# The shared text is a {table} template: the oracle binds plain view names
# (DuckDB side), Spark binds DataFrames via spark.sql kwargs — same ANSI
# body, but no session-global temp view is ever registered, so concurrent
# queries on one shared session can't collide on a view name.
# ---------------------------------------------------------------------------

_CORRELATED_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {orders} o1
    WHERE o_totalprice > 2 * (
        SELECT AVG(o_totalprice) FROM {orders} o2 WHERE o2.o_custkey = o1.o_custkey
    )
"""


@query(
    "q_subquery_correlated",
    oracle=_CORRELATED_SQL.format(orders="orders"),
    category="join",
    description="Correlated scalar subquery (orders > 2x their customer's average) — Catalyst decorrelates to an aggregate + join; same ANSI text runs on both engines.",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_CORRELATED_SQL, orders=t(spark, sf_dir, "orders"))


_CTE_SQL = f"""
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS spend
        FROM {{orders}} GROUP BY o_custkey
    ),
    top25 AS (
        SELECT * FROM cust_orders ORDER BY spend DESC, o_custkey LIMIT 25
    ),
    ranked AS (
        SELECT o_custkey, n_orders, spend,
               ROW_NUMBER() OVER (PARTITION BY length(CAST(o_custkey AS STRING)) % 1
                                  ORDER BY spend DESC, o_custkey) AS rnk
        FROM top25
    )
    SELECT r.rnk, r.o_custkey, r.n_orders, r.spend, c.c_mktsegment AS mktsegment
    FROM ranked r JOIN {{customer}} c ON c.c_custkey = r.o_custkey
"""
# top25 + 25-row rank, not ROW_NUMBER over the whole aggregate: Spark plans
# the ORDER BY/LIMIT CTE as TakeOrderedAndProject (per-partition heaps), so
# the customer-cardinality aggregate never funnels through one partition.
# The constant-but-unfoldable `length(..) % 1` partition key keeps WindowExec
# off the single-partition warning path on the 25-row frame (see
# _util.one_group); DuckDB computes the same 0-valued key. Identical output:
# the composite order is total.


@query(
    "q_cte_pipeline",
    oracle=_CTE_SQL.format(orders="orders", customer="customer"),
    category="aggregation",
    description="Multi-level WITH pipeline (agg → rank → dim join) — one ANSI text, two engines.",
)
def q_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        _CTE_SQL,
        orders=t(spark, sf_dir, "orders"),
        customer=t(spark, sf_dir, "customer"),
    )
