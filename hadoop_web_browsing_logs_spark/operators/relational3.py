"""Relational surface, batch 3 — right join, bag set-ops, map functions,
date arithmetic (SURVEY B3/B7/B8 completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ._util import t
from .relational import dsum, dsum_sql


@query(
    "q_join_right",
    oracle="""
    SELECT n.n_name AS nation_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    category="join",
    description="Right outer join: every nation preserved, suppliers counted (0 via COUNT(col) null semantics).",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "q_set_ops_bag",
    oracle="""
    SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    UNION ALL
    SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey % 3 = 0
        EXCEPT ALL
        SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    """,
    category="setop",
    description="Bag (multiset) semantics: INTERSECT ALL / EXCEPT ALL — duplicates preserved up to multiplicity, unlike the distinct set ops.",
)
def q_set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    cn = c.select(F.col("c_nationkey").alias("nationkey"))
    cn3 = c.filter(F.col("c_custkey") % 3 == 0).select(F.col("c_nationkey").alias("nationkey"))
    sn = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = (
        cn.intersectAll(sn)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        cn3.exceptAll(sn)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionByName(ea)


@query(
    "q_scalar_map",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(DISTINCT event_type)                      AS n_types
    FROM events
    GROUP BY user_id
    """,
    category="scalar",
    description="MapType surface: per-user event-type counts built as a MAP (map_from_entries over collect_list), extracted with element_at/map_keys — oracle validates the extracted scalars.",
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("counts")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("counts", "view"), F.lit(0)).alias("n_view"),
        F.coalesce(F.element_at("counts", "purchase"), F.lit(0)).alias("n_purchase"),
        F.size(F.map_keys("counts")).alias("n_types"),
    )


@query(
    "q_scalar_date2",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber,
           date_diff('day', o.o_orderdate, l.l_shipdate)      AS days_to_ship,
           CAST(o.o_orderdate + INTERVAL '30 days' AS TIMESTAMP) AS due_date,
           (l.l_shipdate > o.o_orderdate + INTERVAL '30 days')  AS late,
           EXTRACT(quarter FROM o.o_orderdate)                  AS order_quarter
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey % 200 = 0
    """,
    category="scalar",
    description="Date arithmetic across a join: datediff, interval add, late-shipment predicate, quarter extraction.",
)
def q_scalar_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    o = t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    due = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days_to_ship"),
        due.alias("due_date"),
        (F.col("l_shipdate") > due).alias("late"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )


@query(
    "q_join_sixway",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    category="join",
    description="TPC-H Q5-style six-way star join (local supplier volume): one fact-fact shuffle, four broadcast dims; Catalyst orders the join tree.",
)
def q_join_sixway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_exists_priority",
    oracle="""
    SELECT o_orderpriority AS orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    category="join",
    description="TPC-H Q4-style priority check: correlated EXISTS over the fact table (semi-join after decorrelation).",
)
def q_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority AS orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_scalar_url",
    oracle="""
    SELECT event_id,
           regexp_extract(url, '^([a-z]+)://', 1)                    AS scheme,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)             AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)      AS path,
           regexp_extract(url, '\\?([^#]*)', 1)                      AS query,
           regexp_extract(url, 'k=([0-9]+)', 1)                      AS k_param
    FROM (SELECT event_id,
                 'https://site' || CAST(user_id AS VARCHAR) || '.example.com/page/'
                   || event_type || '?k=' || CAST(event_id % 50 AS VARCHAR) AS url
          FROM events WHERE event_id % 20 = 0)
    """,
    category="scalar",
    description="URL parsing (the web-browsing-log domain primitive): Spark parse_url for scheme/host/path/query + parameter extraction; oracle recomputes with equivalent regexes on the same constructed URLs.",
)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    url = F.concat(
        F.lit("https://site"),
        F.col("user_id").cast("string"),
        F.lit(".example.com/page/"),
        F.col("event_type"),
        F.lit("?k="),
        (F.col("event_id") % 50).cast("string"),
    )
    d = e.select("event_id", url.alias("url"))
    return d.select(
        "event_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("k_param"),
    )
