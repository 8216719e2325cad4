"""Drop-in reference workflow: the reference's ``main(String[] args)``
contract (ProcessData.java:624-679) re-expressed on Spark.

Reference invocation:  hadoop jar ... ProcessData <input_docs_dir> <output_dir>
                       <stopwords_file> <centers_file>
Engine invocation:     python -m hadoop_web_browsing_logs_spark refjob
                       <input_docs_dir> <output_dir> <stopwords_file> <centers_file>

Outputs (reference text formats):

- ``<output_dir>/inverted_index/``  — Job 1 parity: ``term\\t[1,0,1,]`` lines,
  term-sorted, trailing-comma vectors (ProcessData.java:462-469, SURVEY Q2/Q8)
- ``<output_dir>/kmeans/``          — Job 2 parity: ``<cluster#>\\t<members>``
  lines (space-separated terms, sorted — deterministic where the reference
  depended on shuffle order). Written beside, not inside, Job 1's output
  (the reference nested it into its own input dir — SURVEY Q7).

Side files match the reference's DistributedCache inputs: stopwords = one
word per line (ProcessData.java:423-435); centers = one incidence-vector
string per line in the same ``[v1,v2,...,]`` format (ProcessData.java:579-590).

The reference's bugs are not reproduced (SURVEY Appendix A): cosine is real
cosine (not XOR-power, B1), argmin is a real argmin (B2), no key-rewriting
combiner (B3), cluster numbering is global and deterministic (B4), and any
dimensionality/digit width parses (Q5: the reference handled exactly 3
single-digit dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators._util import one_group


def _parse_center_line(line: str) -> list[int]:
    """Parse the reference's vector serialization ``[1,0,1,]`` (tolerates the
    trailing comma, like TokenizerMapper2's parser — ProcessData.java:545-557,
    but for any length/width)."""
    body = line.strip().lstrip("[").rstrip("]")
    return [int(x) for x in body.split(",") if x.strip() != ""]


def run_reference_jobs(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    stopwords_file: str,
    centers_file: str,
) -> DataFrame:
    """Execute Job 1 + Job 2 as one lazy DAG; write both reference-format
    outputs; return the cluster DataFrame."""
    from .operators.text import densify_incidence, inverted_index, remove_stopwords, stem_terms, tokenize
    from .sources.readers import read_corpus_dir
    from .sources.writers import write_reference_text

    with open(stopwords_file) as fh:
        stopwords = tuple(w.strip().lower() for w in fh if w.strip())
    with open(centers_file) as fh:
        centers = [_parse_center_line(ln) for ln in fh if ln.strip()]

    corpus = read_corpus_dir(spark, input_dir)
    n_docs = corpus.count()  # A3: corpus cardinality == vector length

    toks = stem_terms(remove_stopwords(tokenize(corpus), spark, stopwords))
    index = toks.groupBy("term").agg(
        F.sort_array(F.collect_set("doc_id")).alias("postings"),
        F.size(F.collect_set("doc_id")).alias("df"),
    )
    dense = densify_incidence(index, n_docs=n_docs, one_based=True)
    write_reference_text(dense, f"{output_dir}/inverted_index", term_col="term", vec_col="vec")

    centers_df = spark.createDataFrame(
        [(i + 1, vec) for i, vec in enumerate(centers)], ["center_id", "cvec"]
    )
    # cosine on 0/1 vectors via intersection counts (sparse-equivalent form)
    dot = F.aggregate(
        F.zip_with("vec", "cvec", lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(F.size(F.col("postings")).cast("double"))
    norm_c = F.sqrt(
        F.aggregate("cvec", F.lit(0).cast("bigint"), lambda acc, x: acc + x).cast("double")
    )
    dist = 1 - dot / (norm_v * norm_c)
    w = W.partitionBy("term").orderBy("dist", "center_id")
    assigned = (
        dense.crossJoin(F.broadcast(centers_df))
        .select("term", "postings", "center_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    clusters = (
        assigned.groupBy("center_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_list("term"))).alias("members"))
        .withColumn("cluster", F.row_number().over(W.partitionBy(one_group("center_id")).orderBy("center_id")))
        .select("cluster", "members")
    )
    (
        clusters.sort("cluster")
        .select(F.concat_ws("\t", F.col("cluster").cast("string"), F.col("members")).alias("value"))
        .write.mode("overwrite")
        .text(f"{output_dir}/kmeans")
    )
    return clusters
