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
        # when(isNotNull): a NULL event_type cannot be a map key (Spark
        # throws NULL_MAP_KEY); collect_list skips the NULL entry, so the
        # user keeps their row and n_types matches COUNT(DISTINCT)'s
        # NULL-skipping semantics (round 7 adversarial fixture)
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("event_type").isNotNull(), F.struct("event_type", "n"))
            )
        ).alias("counts")
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
    description="TPC-H Q5-style six-way star join (local supplier volume): one fact-fact shuffle; nation/region (fixed 25/5 rows) broadcast by hint, customer/supplier (SF-scaled) unhinted — the planner broadcasts them only while they fit.",
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
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
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
    # {table} templating instead of temp views — same ANSI body as the
    # oracle, no session-global view names to collide on
    return spark.sql(
        """
        SELECT o_orderpriority AS orderpriority, COUNT(*) AS n_orders
        FROM {orders} o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """,
        orders=t(spark, sf_dir, "orders"),
        lineitem=t(spark, sf_dir, "lineitem"),
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


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE/upsert emulation (no Delta in this environment): updated and new
    rows win; untouched target rows survive — ``updates ∪ (target ANTI-JOIN
    updates)``. At scale both sides hash on the key once; with a Delta/Iceberg
    sink this becomes a real MERGE INTO."""
    return updates.unionByName(target.join(updates, key, "left_anti"))


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal, 'UPDATED' AS c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
    ),
    merged AS (
        SELECT * FROM updates
        UNION ALL
        SELECT * FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    )
    SELECT c_mktsegment AS mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_bal
    FROM merged
    GROUP BY c_mktsegment
    """,
    category="join",
    description="MERGE/upsert emulation (CDC shape): updates ∪ target-anti-updates; summarized post-merge (real MERGE INTO once a Delta/Iceberg sink is attached).",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    merged = merge_upsert(c, updates, "c_custkey")
    return merged.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("total_bal")
    )


@query(
    "q_agg_bool_bit",
    oracle="""
    SELECT l_returnflag AS returnflag,
           bool_and(l_quantity > 0)    AS all_positive,
           bool_or(l_discount > 0.09)  AS any_high_discount,
           bit_and(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
           bit_or(CAST(l_linenumber AS BIGINT)) AS line_bit_or,
           bit_xor(CAST(l_orderkey AS BIGINT))  AS orderkey_bit_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregation",
    description="Boolean (every/some) and bitwise (and/or/xor) aggregates — order-independent by construction.",
)
def q_agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.bit_and(F.col("l_quantity").cast("bigint")).alias("qty_bit_and"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("line_bit_or"),
        F.bit_xor(F.col("l_orderkey").cast("bigint")).alias("orderkey_bit_xor"),
    )


@query(
    "q_scalar_string2",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(lower(p_name), ' '),
               w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS initcap_name,
           translate(p_brand, '#', '-')        AS brand_dashed,
           repeat('*', p_size % 5 + 1)         AS stars,
           reverse(p_type)                     AS type_reversed,
           left(p_name, 3)                     AS name_left3,
           right(p_name, 3)                    AS name_right3,
           position('widget' IN p_name)        AS widget_pos,
           starts_with(p_type, 'ECO')          AS is_economy,
           contains(p_name, 'small')           AS has_small
    FROM part
    """,
    category="scalar",
    description="String surface 2: initcap/translate/repeat/reverse/left/right/position/starts_with/contains.",
)
def q_scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("initcap_name"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5 + 1).cast("int")).alias("stars"),
        F.reverse("p_type").alias("type_reversed"),
        F.substring("p_name", 1, 3).alias("name_left3"),
        F.expr("right(p_name, 3)").alias("name_right3"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.startswith(F.col("p_type"), F.lit("ECO")).alias("is_economy"),
        F.contains(F.col("p_name"), F.lit("small")).alias("has_small"),
    )


@query(
    "q_scalar_array2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           list_position(seq, 3)                        AS pos_of_3,
           COALESCE(array_to_string(list_filter(seq, x -> x % 2 = 0), ','), '') AS evens,  -- DuckDB: empty-list join is NULL
           array_to_string(list_concat(seq, [99]), ',') AS appended,
           seq[1]                                       AS first_el,
           seq[-1]                                      AS last_el,
           array_to_string(list_sort(list_distinct(list_concat(seq, seq))), ',') AS dedup_sorted
    FROM (SELECT l_orderkey, l_linenumber,
                 generate_series(1, CAST(l_quantity AS INTEGER) % 6 + 1) AS seq
          FROM lineitem WHERE l_orderkey % 150 = 0)
    """,
    category="scalar",
    description="Array surface 2: position/filter/concat/element access/distinct over generated sequences.",
)
def q_scalar_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 150 == 0)
    seq = F.sequence(F.lit(1), (F.col("l_quantity").cast("int") % 6) + 1)
    d = li.select("l_orderkey", "l_linenumber", seq.alias("seq"))
    return d.select(
        "l_orderkey",
        "l_linenumber",
        F.array_position("seq", 3).alias("pos_of_3"),
        F.array_join(F.filter("seq", lambda x: x % 2 == 0), ",").alias("evens"),
        F.array_join(F.concat("seq", F.array(F.lit(99))), ",").alias("appended"),
        F.element_at("seq", 1).alias("first_el"),
        F.element_at("seq", -1).alias("last_el"),
        F.array_join(F.sort_array(F.array_distinct(F.concat("seq", "seq"))), ",").alias("dedup_sorted"),
    )


@query(
    "q_profile_columns",
    oracle=f"""
    SELECT 'l_quantity' AS col, COUNT(*) AS n, COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val,
           {dsum_sql('l_quantity')} / COUNT(*) AS mean_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount), {dsum_sql('l_discount')} / COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(l_tax), COUNT(DISTINCT l_tax),
           MIN(l_tax), MAX(l_tax), {dsum_sql('l_tax')} / COUNT(*)
    FROM lineitem
    """,
    category="aggregation",
    description="Column profiling (data-quality stage): null counts, distinct cardinality, min/max/mean per column in one pass per column set.",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        n = F.count(F.lit(1))
        return li.agg(
            F.lit(col).alias("col"),
            n.alias("n"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
            (dsum(col) / n).alias("mean_val"),
        )

    out = profile("l_quantity")
    for c in ("l_discount", "l_tax"):
        out = out.unionByName(profile(c))
    return out


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1k,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS sum_below_1k
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    category="window",
    description="RANGE window frames over a numeric ordering (value-based neighborhoods, vs the ROWS frames elsewhere).",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w.rangeBetween(-1000, 1000)).alias("n_within_1k"),
        (F.sum(cents).over(w.rangeBetween(-1000, W.currentRow)).cast("double") / 100).alias(
            "sum_below_1k"
        ),
    )


# ---------------------------------------------------------------------------
# Data profiling (the validation pass a pipeline runs before training on a
# new dataset drop): equi-width histogram + per-column stats
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 600000.0, 24


@query(
    "q_agg_histogram",
    # DuckDB has no width_bucket; the twin spells out the SQL-standard
    # semantics with the same float sequence Spark's WidthBucket uses
    # ((x - lo) / bucket_width, then FLOOR) — verified bit-identical.
    oracle=f"""
    WITH b AS (
        SELECT CASE WHEN o_totalprice < {HIST_LO} THEN 0
                    WHEN o_totalprice >= {HIST_HI} THEN {HIST_BUCKETS} + 1
                    ELSE CAST(FLOOR((o_totalprice - {HIST_LO})
                              / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})) AS BIGINT) + 1
               END AS bucket
        FROM orders
    )
    SELECT bucket, COUNT(*) AS n,
           {HIST_LO} + (bucket - 1) * ({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS} AS bucket_lo
    FROM b GROUP BY bucket
    """,
    category="aggregation",
    description=(
        "Equi-width histogram of order totals via SQL-standard width_bucket "
        "— the single-pass distribution profile a pipeline computes on every "
        "new data drop. One groupBy on a small integer key (map-side "
        "partial), bucket count fixed, so the reduce side is k rows "
        "regardless of input scale."
    ),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    b = F.width_bucket("o_totalprice", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BUCKETS))
    return (
        o.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "bucket_lo",
            F.lit(HIST_LO) + (F.col("bucket") - 1) * (HIST_HI - HIST_LO) / HIST_BUCKETS,
        )
    )


@query(
    "q_profile_documents",
    oracle="""
    SELECT 'doc_id' AS col, COUNT(*) - COUNT(doc_id) AS n_null,
           COUNT(DISTINCT doc_id) AS n_distinct,
           MIN(LENGTH(CAST(doc_id AS VARCHAR))) AS min_len,
           MAX(LENGTH(CAST(doc_id AS VARCHAR))) AS max_len
    FROM documents
    UNION ALL
    SELECT 'text', COUNT(*) - COUNT(text), COUNT(DISTINCT text),
           MIN(LENGTH(text)), MAX(LENGTH(text)) FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
           MIN(LENGTH(lang)), MAX(LENGTH(lang)) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
           MIN(LENGTH(source)), MAX(LENGTH(source)) FROM documents
    """,
    category="aggregation",
    description=(
        "Per-column dataset profile (null count, distinct count, min/max "
        "stringified length) for the documents table — the schema-validation "
        "pass before a training run. One aggregation per column batched into "
        "a single scan on the Spark side (every stat is an agg expression in "
        "one groupBy-less agg), then unpivoted to rows; the oracle's UNION "
        "of per-column scans is the semantic twin."
    ),
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source"]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        # distinct-count WIDE text via its 16-byte MD5 fingerprint, not the
        # raw value: Spark plans multi-countDistinct as Expand + an exchange
        # hash-partitioned on the distinct children, so a raw `text` child
        # ships the whole corpus through the shuffle (the round-6
        # registry-wide fat-exchange audit's one true hit). The fingerprint
        # form shuffles 32 chars/row regardless of document size — the same
        # fingerprint-not-payload argument as q_dedup_exact — and equals
        # COUNT(DISTINCT text) exactly modulo MD5 collisions (~n²/2¹²⁸).
        # The oracle keeps COUNT(DISTINCT text): the driver hash proves the
        # two formulations agree on the data.
        distinct_child = F.md5(F.col(c)) if c == "text" else F.col(c)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(distinct_child).alias(f"{c}__n_distinct"),
            F.min(F.length(s)).alias(f"{c}__min_len"),
            F.max(F.length(s)).alias(f"{c}__max_len"),
        ]
    wide = d.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n_null").cast("bigint").alias("n_null"),
                F.col(f"{c}__n_distinct").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__min_len").cast("bigint").alias("min_len"),
                F.col(f"{c}__max_len").cast("bigint").alias("max_len"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


@query(
    "q_join_nullsafe",
    # NULLIF(key, 3) synthesizes NULL keys on both sides: under plain
    # equality those rows drop (NULL = NULL is NULL); under null-safe
    # equality they pair up. n_matched counts both channels so the twin is
    # discriminating against an accidental plain-equality implementation.
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_matched,
           COUNT(*) FILTER (WHERE c.c_nationkey = 3) AS via_null_channel
    FROM customer c
    JOIN nation n
      ON NULLIF(c.c_nationkey, 3) IS NOT DISTINCT FROM NULLIF(n.n_nationkey, 3)
    GROUP BY n.n_name
    """,
    category="join",
    description=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match "
        "NULL keys instead of silently dropping. EqualNullSafe is a valid "
        "hash-join key in Spark, so the plan stays a broadcast hash join — "
        "no fallback to nested-loop — which is what makes the variant usable "
        "on a fact table with nullable keys at scale."
    ),
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    ck = F.nullif(F.col("c_nationkey"), F.lit(3))
    nk = F.nullif(F.col("n_nationkey"), F.lit(3))
    return (
        c.withColumn("_ck", ck)
        .join(F.broadcast(n.withColumn("_nk", nk)), F.col("_ck").eqNullSafe(F.col("_nk")))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.count(F.when(F.col("c_nationkey") == 3, 1)).alias("via_null_channel"),
        )
    )


@query(
    "q_quality_expectations",
    oracle="""
    SELECT 'lineitem_quantity_in_range' AS check_name,
           COUNT(*) AS n_checked,
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           COUNT(*),
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.9)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_shipdate_not_null',
           COUNT(*),
           COUNT(*) - COUNT(l_shipdate)
    FROM lineitem
    UNION ALL
    SELECT 'orders_orderkey_unique',
           COUNT(*),
           COUNT(*) - COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           COUNT(*),
           COUNT(*) FILTER (WHERE o.o_orderkey IS NULL)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    category="aggregation",
    description=(
        "Declarative data-quality expectations (the dbt-test / "
        "Great-Expectations primitive): range, not-null, uniqueness, and "
        "referential-integrity checks, each a single aggregation (the FK "
        "check a left join + null count), UNION ALL'd into one "
        "(check_name, n_checked, n_violations) report. Every check is one "
        "pass over its table with map-side partial aggregation; the FK "
        "check's join key is the fact's own join key, so at scale it rides "
        "the same co-partitioning the real workload uses."
    ),
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def report(name: str, df, n_violations):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            n_violations.alias("n_violations"),
        )

    qty = report(
        "lineitem_quantity_in_range",
        li,
        F.count(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)),
    )
    disc = report(
        "lineitem_discount_in_range",
        li,
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.9), 1)),
    )
    ship = report(
        "lineitem_shipdate_not_null",
        li,
        F.count(F.lit(1)) - F.count("l_shipdate"),
    )
    uniq = report(
        "orders_orderkey_unique",
        o,
        F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
    )
    fk = report(
        "lineitem_orderkey_fk",
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)),
    )
    return qty.unionAll(disc).unionAll(ship).unionAll(uniq).unionAll(fk)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, fp) -> DataFrame:
    """Classify every key across two table snapshots as added / removed /
    changed / unchanged — the CDC diff a crawl-refresh or lakehouse ingest
    step emits before writing a changelog. ``fp`` is a fingerprint column
    expression evaluated on each side (must be non-null whenever the row
    exists, e.g. md5 over coalesced payload columns). One full-outer hash
    join on the key — a single co-partitioned shuffle at any scale; no
    payload columns cross the exchange, only fingerprints."""
    o = old.select(F.col(key), fp.alias("fp_old"))
    n = new.select(F.col(key), fp.alias("fp_new"))
    return o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH snap_old AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 5 THEN 'OLD::' || COALESCE(text, '')
                    ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 2
    ),
    snap_new AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3
    ),
    o AS (SELECT doc_id, md5(COALESCE(text, '')) AS fp_old FROM snap_old),
    n AS (SELECT doc_id, md5(COALESCE(text, '')) AS fp_new FROM snap_new)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN fp_old = fp_new THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL JOIN n ON o.doc_id = n.doc_id
    """,
    category="join",
    description=(
        "Snapshot diff (CDC changelog): classify every doc_id across two "
        "corpus snapshots as added / removed / changed / unchanged by "
        "comparing MD5 fingerprints through one full-outer hash join — the "
        "step a crawl refresh runs before incremental dedup/re-train. The "
        "fixture derives both snapshots deterministically from the one "
        "documents table (drop doc_id%7=2 from old, doc_id%11=3 from new, "
        "rewrite text on doc_id%13=5) so every status class is exercised "
        "and the diff is engine-provable. Scale shape: fingerprints are "
        "computed map-side, only (key, fp) crosses the single exchange."
    ),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 2).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 5,
            F.concat(F.lit("OLD::"), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = docs.filter(F.col("doc_id") % 11 != 3).select("doc_id", "text")
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    return snapshot_diff(old, new, "doc_id", fp)


@query(
    "q_incremental_agg_refresh",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS n_chars
    FROM (SELECT source, text FROM documents WHERE doc_id % 11 <> 3)
    GROUP BY source
    ORDER BY source
    """,
    category="agg",
    description=(
        "Incremental materialized-view maintenance: per-source corpus "
        "stats (doc count, total chars) for the NEW snapshot computed as "
        "old-MV plus changelog deltas — docs delta from presence flags, "
        "chars delta from per-row length differences, merged into the old "
        "aggregate through a null-safe full-outer join — NOT by rescanning "
        "the new snapshot. The DuckDB oracle IS the full recompute, so the "
        "gate proves the delta algebra exactly equals recomputation, "
        "including sources that disappear (all docs removed -> the merged "
        "count hits zero and the row is retired). At 100 TB the old MV and "
        "the changelog are both tiny next to the corpus: this is the "
        "refresh step that avoids the full scan a recompute would pay. "
        "Snapshots derive from the one documents table exactly as in "
        "q_snapshot_diff (drop doc_id%7=2 from old, doc_id%11=3 from new, "
        "rewrite text on doc_id%13=5) so added/removed/changed/unchanged "
        "all contribute deltas."
    ),
)
def q_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    chars = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    old = docs.filter(F.col("doc_id") % 7 != 2).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 5,
            F.length(
                F.concat(F.lit("OLD::"), F.coalesce(F.col("text"), F.lit("")))
            ).cast("long"),
        )
        .otherwise(chars)
        .alias("chars"),
    )
    new = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id", "source", chars.alias("chars")
    )

    # the standing MV over the OLD snapshot (at 100 TB: read, not computed)
    mv_old = old.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("chars").alias("n_chars")
    )

    # changelog deltas: one co-partitioned full-outer join on doc_id; only
    # (doc_id, source, chars) cross the exchange, never the text payload
    o = old.select("doc_id", F.col("source").alias("src_o"), F.col("chars").alias("ch_o"))
    n = new.select("doc_id", F.col("source").alias("src_n"), F.col("chars").alias("ch_n"))
    log = o.join(n, "doc_id", "full_outer").select(
        F.coalesce("src_n", "src_o").alias("source"),
        (
            F.when(F.col("src_n").isNotNull(), 1).otherwise(0)
            - F.when(F.col("src_o").isNotNull(), 1).otherwise(0)
        ).alias("d_docs"),
        (F.coalesce("ch_n", F.lit(0)) - F.coalesce("ch_o", F.lit(0))).alias("d_chars"),
    )
    deltas = log.groupBy("source").agg(
        F.sum("d_docs").alias("d_docs"), F.sum("d_chars").alias("d_chars")
    )

    # merge: MV + deltas, null-safe on the group key (a NULL source must
    # stay ONE group on both sides, matching the recompute's GROUP BY)
    merged = mv_old.join(
        deltas, mv_old["source"].eqNullSafe(deltas["source"]), "full_outer"
    ).select(
        F.coalesce(deltas["source"], mv_old["source"]).alias("source"),
        (F.coalesce(mv_old["n_docs"], F.lit(0)) + F.coalesce(deltas["d_docs"], F.lit(0))).alias("n_docs"),
        (F.coalesce(mv_old["n_chars"], F.lit(0)) + F.coalesce(deltas["d_chars"], F.lit(0))).alias("n_chars"),
    )
    return merged.filter(F.col("n_docs") > 0).orderBy("source")


@query(
    "q_agg_sketch_reaggregate",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS ok
    FROM events GROUP BY event_type
    """,
    category="aggregation",
    description=(
        "Sketch re-aggregation: per-(type, day) HLL sketches "
        "(hll_sketch_agg, Apache DataSketches) union-merged per type "
        "(hll_union_agg) and estimated — the rollup-without-rescan shape "
        "for distinct counts at 100 TB: daily sketch partials persist at "
        "bytes per group, and any coarser rollup (weekly, monthly, "
        "all-time) is a cheap register-wise merge of stored sketches "
        "instead of a full re-scan of the fact table. The query gates the "
        "merged estimate against the exact per-type distinct (within "
        "max(5, 5%) — default lgConfigK=12 gives ~1.6% rsd) and emits "
        "the exact counts, which the oracle hash-proves; the final "
        "exact⋈merged stitch is eqNullSafe so the NULL-type group "
        "survives like the oracle's GROUP BY. The built-in "
        "approx_count_distinct gate (q_agg_approx_distinct_gate) covers "
        "the one-shot estimate; this one proves MERGEABILITY."
    ),
)
def q_agg_sketch_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", F.to_date("ts").alias("day"), "user_id")
    daily = e.groupBy("event_type", "day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.groupBy("event_type").agg(F.count_distinct("user_id").alias("exact_users"))
    x, m = exact.alias("x"), merged.alias("m")
    stitched = x.join(
        m, F.col("x.event_type").eqNullSafe(F.col("m.event_type"))
    ).select(
        F.col("x.event_type").alias("event_type"),
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(F.lit(5.0), F.lit(0.05) * F.col("exact_users"))
        ).alias("ok"),
    )
    return stitched


@query(
    "q_scalar_variant",
    oracle="""
    WITH j AS (
        SELECT props, TRY_CAST(props AS JSON) AS pj,
               json_type(json_extract(TRY_CAST(props AS JSON), '$.k')) AS kt,
               json_extract_string(TRY_CAST(props AS JSON), '$.k') AS ks
        FROM events
    ),
    c AS (
        SELECT CASE
                 WHEN props IS NULL THEN 'missing'
                 WHEN NOT json_valid(props) THEN 'invalid'
                 WHEN json_type(pj) = 'NULL' THEN 'json_null'
                 WHEN json_type(pj) = 'OBJECT' THEN 'object'
                 WHEN json_type(pj) = 'ARRAY' THEN 'array'
                 ELSE 'scalar'
               END AS kind,
               -- Replicate Spark's try_variant_get(..., 'bigint') CAST
               -- semantics per JSON type (ADVICE r9, probe-verified):
               -- doubles TRUNCATE toward zero (5.7 -> 5, where DuckDB's
               -- string TRY_CAST would round to 6), booleans map to 1/0
               -- (DuckDB: NULL), and strings parse only when strictly
               -- integral (' 5 '/'+5' -> 5, but '5.7' AND '5.0' -> NULL
               -- where DuckDB would accept); int64 overflow -> NULL both.
               CASE kt
                 WHEN 'UBIGINT' THEN TRY_CAST(ks AS BIGINT)
                 WHEN 'BIGINT'  THEN TRY_CAST(ks AS BIGINT)
                 WHEN 'DOUBLE'  THEN TRY_CAST(TRUNC(TRY_CAST(ks AS DOUBLE)) AS BIGINT)
                 WHEN 'BOOLEAN' THEN CASE ks WHEN 'true' THEN 1 WHEN 'false' THEN 0 END
                 -- Full <=0x20 trim (round 11, ADVICE r10, probe-verified):
                 -- Spark's variant string-cast trims the same [0x00-0x20]
                 -- band as try_cast (try_variant_get on "<TAB>5" -> 5, NOT
                 -- NULL), so the VARCHAR branch strips it too; NBSP stays.
                 WHEN 'VARCHAR' THEN CASE
                     WHEN regexp_matches(regexp_replace(ks,
                              '^[\\x00- ]+|[\\x00- ]+$', '', 'g'),
                          '^[+-]?[0-9]+$')
                     THEN TRY_CAST(regexp_replace(ks,
                              '^[\\x00- ]+|[\\x00- ]+$', '', 'g') AS BIGINT) END
                 ELSE NULL
               END AS k
        FROM j
    )
    SELECT kind, COUNT(*) AS n_rows, COUNT(k) AS n_k,
           -- TRY_CAST (round 10, fuzz-found): DuckDB's SUM(BIGINT) widens
           -- to HUGEINT; the Spark side sums in DECIMAL(38,0) for the same
           -- exactness and both NULL on int64 overflow of the final value
           TRY_CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
    FROM c GROUP BY kind
    """,
    category="scalar",
    description=(
        "Spark 4 VARIANT surface over the hostile events.props JSON column: "
        "try_parse_json + schema_of_variant classify every row into "
        "missing/invalid/json_null/object/array/scalar, and "
        "try_variant_get('$.k','bigint') extracts the typed field — NULL on "
        "type mismatch, nested objects, and malformed input, probe-verified "
        "identical to DuckDB's json_valid/json_type/json_extract_string "
        "semantics on every poison class the adversarial fixture carries "
        "(non-JSON, empty string, bare scalars, JSON null, nested k, "
        "string-typed k, and — round 10, ADVICE r9 — float/boolean/"
        "decimal-string/int64-overflow k: the oracle replicates Spark's "
        "variant CAST per json_type, truncating doubles and mapping "
        "booleans to 1/0). VARIANT is the shredding-friendly 100 TB path for "
        "semi-structured columns: one parse, binary-encoded storage, typed "
        "paths pushed down — vs re-parsing JSON text per expression. All "
        "outputs exact integers."
    ),
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    vt = F.schema_of_variant(v)
    kind = (
        F.when(F.col("props").isNull(), "missing")
        .when(vt.isNull(), "invalid")
        .when(F.is_variant_null(v), "json_null")
        .when(vt.startswith("OBJECT"), "object")
        .when(vt.startswith("ARRAY"), "array")
        .otherwise("scalar")
    )
    c = e.select(
        kind.alias("kind"),
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    # DECIMAL(38,0) accumulator (round 10, fuzz-found): ANSI SUM(BIGINT)
    # throws on int64-edge groups where DuckDB widens to HUGEINT
    return c.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("k").alias("n_k"),
        F.sum(F.col("k").cast("decimal(38,0)")).try_cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
