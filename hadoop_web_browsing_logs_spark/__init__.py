"""PySpark-native analytics engine with the capabilities of
``gbrandtio/hadoop-web-browsing-logs`` (reference: /root/reference/ProcessData.java),
rebuilt Spark-first — DataFrame/SQL plans optimized by Catalyst, not a port of the
reference's hand-wired MapReduce jobs (ProcessData.java:650-678).

Layout
------
- ``session``    SparkSession factory tuned for local[32] tests / cluster scale
- ``sources``    readers/writers (Parquet/CSV/JSON/text, fixture-table loader)
- ``functions``  scalar kernels: Porter stemmer, vector math, text stats, hashing
- ``operators``  composable DataFrame operators (relational, text, vectors,
                 dedup, similarity, multimodal)
- ``plans``      the query registry — every declared capability as a named
                 (spark_query, oracle_sql) pair consumed by ``__spark_entry__``
- ``streaming``  Structured Streaming operators over the ``events`` table
"""

__version__ = "0.1.0"
