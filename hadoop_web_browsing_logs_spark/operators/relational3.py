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
