"""Regenerate the physical-plan dumps in docs/plans/.

Usage: python docs/plans/dump_plans.py  (run from the repo root)

Each dump is `df.explain("formatted")` output at sf0.01, captured before
execution (AQE not yet finalized) — the shape reviewed for pushdown,
broadcast choice, TakeOrdered, and partial aggregation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from hadoop_web_browsing_logs_spark.plans.registry import get_query
from hadoop_web_browsing_logs_spark.session import get_spark

SF = "/root/testdata/sf0.01"
OUT = os.path.dirname(os.path.abspath(__file__))

DUMPED = [
    "q1_pricing_summary",
    "q_join_multiway",
    "q_ref_pipeline",
    "q_stream_tumbling_batch",
    "q_text_inverted_index",
    "q_text_term_doc_freq",
    "q_text_tfidf",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_ref_pipeline_unstemmed",
    "q_dedup_minhash_lsh_portable",
    "q_llm_pack_sequences",
    "q_llm_domain_cap",
    "q_window_ntile_distributed",
    "q_sim_lsh_candidates_portable",
    "q_vec_quantize_int8",
    "q_events_funnel",
    "q_dedup_substring",
    "q_text_collocations",
    "q_vec_nearest_center",
    "q_join_bloom_prefilter",
    "q_events_gapfill",
    "q_events_scd2",
    "q_events_rollup_multires",
    "q_sim_range_search",
    "q_events_anomaly_zscore",
    # round-4 additions
    "q_window_rank_salted",
    # round-8 additions: the corpus-LM scorers, the packing-output shard
    # manifest, the weighted reservoir sampler, and the CDC snapshot diff
    "q_llm_unigram_logprob",
    "q_llm_bigram_logprob",
    "q_llm_shard_manifest",
    "q_llm_weighted_sample",
    "q_snapshot_diff",
    "q_agg_heavy_hitters",
    "q_incremental_agg_refresh",
    # late round-8: graph + statistical + fuzzy-join + sketch-rollup family
    "q_graph_pagerank",
    "q_events_correlation",
    "q_events_chisq",
    "q_events_winsorize",
    "q_events_path_mining",
    "q_dedup_fuzzy_vocab",
    "q_agg_sketch_reaggregate",
    "q_events_robust_zscore",
    "q_events_trend",
    "q_graph_triangles",
    # round 9: the dangling-redistribution PageRank twin + BM25 retrieval
    "q_graph_pagerank_dangling",
    "q_text_bm25",
    "q_events_ab_welch",
    "q_events_ewma",
    "q_vec_covariance",
    "q_events_spearman",
    "q_events_type_affinity",
    "q_graph_label_propagation",
    "q_graph_reachability",
    "q_scalar_variant",
    "q_vec_covariance_fast",
    "q_llm_corpus_funnel",
    # round 10: the hash-provable Lloyd recurrence (broadcast assignment
    # fold + one (center_id, dim)-keyed exchange per iteration; lazy
    # checkpoints truncate the lineage so the dump shows the LAST
    # iteration's shape, like PageRank)
    "q_vec_kmeans_lloyd",
    # q_dedup_keep_canonical is NOT dumped: connected-components builds its
    # plan by iterative lineage extension, so the explain output is ~10k
    # lines of repeated join blocks — noise, not evidence. Its scale shape
    # is documented in dedup.py and SCALE.md instead.
]


def main() -> None:
    spark = get_spark("plandump", cpus=8)
    for name in DUMPED:
        df = get_query(name).fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, f"{name}.txt"), "w") as fh:
            fh.write(f"# {name} — physical plan (sf0.01, AQE pre-execution)\n\n{plan}")
        print("wrote", name)


if __name__ == "__main__":
    main()
