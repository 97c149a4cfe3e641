"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: converged PageRank over the derived link graph
                 at sf0.001, top-20 ranking.
queries()      — one binding per implemented operator (SURVEY.md §2 +
                 training-data-pipeline ops); see networkit_spark/queries.py.
oracle_sql()   — exact DuckDB twins; see networkit_spark/oracles.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import DISTRIBUTE_SINKS, pagerank
    from networkit_spark.sources.tables import derive_web_edges

    sf_dir = "/root/testdata/sf0.001"
    g = Graph.from_edges(derive_web_edges(spark, sf_dir), directed=True)
    res = pagerank(g, damp=0.85, tol=1e-8, distribute_sinks=DISTRIBUTE_SINKS)
    return res.ranking(20).select("id", F.round("score", 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from networkit_spark.queries import QUERIES

    return dict(QUERIES)


def _side_channel(name: str) -> str:
    """Driver correctness runs at sf0.01 — the oracle reads the labels the
    sf0.01 query run wrote (queries.side_channel_path keeps other scale
    factors on their own files)."""
    from networkit_spark.queries import side_channel_path

    return side_channel_path(name, "sf0.01")


def oracle_sql() -> dict[str, str]:
    from networkit_spark import oracles as o

    return {
        "graph_stats": o.graph_stats_sql(),
        "graph_degrees": o.graph_degrees_sql(),
        "pagerank_5iter": o.pagerank_sql(),
        "pagerank_undirected_5iter": o.pagerank_sql(undirected=True),
        "cc_labels": o.cc_sql(),
        "cc_sizes": o.cc_sizes_sql(),
        "plp_labels_2iter": o.plp_sql(),
        "triangle_total": o.triangle_total_sql(),
        "triangle_per_node": o.triangle_per_node_sql(),
        "triangle_edge_scores": o.triangle_edge_scores_sql(),
        "local_clustering": o.local_cc_sql(),
        "global_clustering": o.global_cc_sql(),
        "degree_centrality": o.degree_centrality_sql(),
        "modularity_plp": o.modularity_plp_sql(),
        "coverage_plp": o.coverage_plp_sql(),
        "subgraph_stats": o.subgraph_stats_sql(),
        "compact_ids": o.compact_ids_sql(),
        "dedup_exact": o.dedup_exact_sql(),
        "minhash_signatures": o.minhash_sql(),
        "lsh_candidate_pairs": o.lsh_pairs_sql(),
        "near_dup_jaccard": o.near_dup_jaccard_sql(),
        "dedup_clusters": o.dedup_clusters_sql(),
        "simhash": o.simhash_sql(),
        "token_stats": o.token_stats_sql(),
        "quality_scores": o.quality_sql(),
        "lang_id": o.lang_id_sql(),
        "doc_fingerprint": o.fingerprint_sql(),
        "knn_cosine_top5": o.knn_sql(),
        # IVF at full probe is exact -> same all-pairs oracle
        "ivf_knn_full_probe": o.knn_sql(),
        "node2vec_walks": o.node2vec_walks_sql(),
        "pivot_mds_centered": o.pivot_mds_centered_sql(),
        "pagerank_nibble": o.pagerank_nibble_sql(),
        "degree_preserving_shuffle": o.degree_preserving_shuffle_sql(),
        # GlobalCurveball: property oracle (exact degree preservation on
        # a simple graph — the reference GTest contract); round-level
        # bit-exactness is pytest-locked by a pure-Python replay.
        "curveball_degrees": o.curveball_degrees_sql(),
        "spsp_distances": o.spsp_sql(),
        "spsp_weighted": o.spsp_weighted_sql(),
        "st_distances_bidirectional": o.st_distances_sql(),
        "st_weighted_bidirectional": o.st_weighted_sql(),
        "floyd_warshall_mod7": o.floyd_warshall_sql(),
        "pll_distances": o.pll_distances_sql(),
        "dynpll_distances": o.dynpll_distances_sql(),
        "dyn_betweenness_one_state": o.dyn_one_state_sql(),
        "dynbfs_state": o.dynbfs_sql(),
        "dynapsp_state": o.dynapsp_sql(),
        "quadrangle_scores": o.quadrangle_sql(),
        "prefix_jaccard_scores": o.prefix_jaccard_sql(),
        "geometric_mean_scores": o.geometric_mean_sql(),
        "volume_r123": o.volume_sql(),
        "nf_heuristic": o.nf_heuristic_sql(),
        "commute_time_cycle": o.commute_time_cycle_sql(),
        "spanning_edge_lollipop": o.spanning_edge_lollipop_sql(),
        "electrical_closeness_lollipop": o.electrical_closeness_lollipop_sql(),
        "group_closeness_4": o.group_closeness_sql(),
        "group_harmonic_4": o.group_harmonic_sql(),
        "forest_closeness_cliques": o.forest_closeness_cliques_sql(),
        "complex_paths_adopters": o.complex_paths_adopters_sql(),
        "complex_path_length_seed": o.complex_path_length_sql(),
        "link_pred_extended": o.link_pred_extended_sql(),
        "link_pred_katz": o.link_pred_katz_sql(),
        "adi_pair_scores": o.adi_pair_scores_sql(),
        "link_pred_roc": o.link_pred_curve_sql("roc"),
        "link_pred_pr": o.link_pred_curve_sql("pr"),
        "ann_lsh_buckets": o.ann_buckets_sql(),
        "ann_lsh_top5": o.ann_topk_sql(),
        "embedding_near_dups": o.embedding_near_dup_sql(threshold=0.4),
        "events_hourly": o.events_hourly_sql(),
        "bfs_hops": o.bfs_hops_sql(),
        "closeness": o.closeness_sql(),
        "harmonic_closeness": o.harmonic_sql(),
        "approx_closeness": o.approx_closeness_sql(),
        "scc_labels": o.scc_sql(),
        "eccentricity": o.eccentricity_sql(),
        "effective_diameter_90": o.effective_diameter_sql(),
        "coarsen_cc": o.coarsen_cc_sql(),
        "betweenness_est20": o.estimate_betweenness_sql(),
        "degree_assortativity": o.degree_assortativity_sql(),
        "nominal_assortativity_mod7": o.nominal_assortativity_sql(),
        "adamic_adar": o.adamic_adar_sql(),
        "algebraic_distance": o.algebraic_distance_sql(),
        "link_prediction_d2": o.link_prediction_d2_sql(),
        "jaccard_scores": o.jaccard_scores_sql(),
        "cc_labels_twophase": o.cc_converged_sql(),
        "katz_3iter": o.katz_sql(),
        "gedwalk_levels": o.gedwalk_levels_sql(),
        "group_closeness_swaps": o.group_closeness_swaps_sql(),
        "luby_mis": o.luby_sql(),
        "sfigality": o.sfigality_sql(),
        "square_clustering": o.square_clustering_sql(),
        "reachable_nodes": o.reachable_nodes_sql(),
        "hashing_overlap": o.hashing_overlap_sql(),
        "seir_census": o.seir_sql(),
        "simhash_near_dups": o.simhash_near_dups_sql(),
        "maximal_cliques": o.maximal_cliques_sql(),
        "group_degree": o.group_degree_sql(),
        "laplacian_centrality": o.laplacian_sql(),
        "permanence_mod7": o.permanence_sql(),
        "local_partition_coverage": o.local_partition_coverage_sql(),
        "neighborhood_function": o.neighborhood_function_sql(),
        "decontaminate": o.decontaminate_sql(),
        "tfidf_top5": o.tfidf_sql(),
        "pack_sequences": o.pack_sequences_sql(),
        "partition_eval_mod7": o.partition_eval_sql(),
        "partition_compare": o.partition_compare_sql(),
        "stream_triangles": o.stream_triangles_sql(),
        "biconnected_node_blocks": o.biconnected_node_blocks_sql(),
        "biconnected_size_hist": o.biconnected_size_hist_sql(),
        "top_closeness_10": o.top_closeness_sql(),
        "top_harmonic_10": o.top_harmonic_sql(),
        "cover_f1_mod": o.cover_f1_sql(),
        "cover_hub_dominance_mod": o.cover_hub_dominance_sql(),
        "overlapping_nmi_mod": o.overlapping_nmi_sql(),
        "kpath_scores": o.kpath_sql(),
        "hop_plot": o.hop_plot_sql(),
        "graph_difference": o.graph_difference_sql(),
        "simple_paths": o.simple_paths_sql(),
        "local_similarity_scores": o.local_similarity_sql(),
        "multiscale_scores": o.multiscale_sql(),
        "chance_triangle_scores": o.chance_triangle_sql(),
        "simmelian_overlap": o.simmelian_overlap_sql(),
        "forest_fire_scores": o.forest_fire_sql(),
        "random_edge_scores": o.random_edge_sql(),
        "random_node_edge_scores": o.random_node_edge_sql(),
        "havel_hakimi_degrees": o.degree_histogram_sql(),
        "config_model_degrees": o.config_model_degrees_sql(),
        "esmc_degrees": o.degree_histogram_sql(),
        "planarity_cases": o.planarity_cases_sql(),
        "approx_betweenness_rk": o.approx_betweenness_rk_sql(),
        "approx_group_betweenness": o.approx_group_betweenness_sql(),
        "scd_ground_truth_mod": o.scd_ground_truth_sql(),
        "conductance_parity": o.conductance_parity_sql(),
        "sampled_rand_mod": o.sampled_rand_sql(),
        "min_spanning_forest": o.min_spanning_forest_sql(),
        "umsf_members": o.umsf_members_sql(),
        # Tie-broken matching: side-channel property oracle (validity,
        # edge realness, maximality, size) — see matching_summary_sql.
        "matching_summary": o.matching_summary_sql(
            _side_channel("matching_summary")
        ),
        "suitor_matching": o.suitor_matching_sql(
            _side_channel("suitor_matching")
        ),
        "b_matching_summary": o.b_matching_summary_sql(
            _side_channel("b_matching_summary")
        ),
        # Convergence-mode queries: RECURSIVE-CTE twins — DuckDB iterates
        # the same superstep to the same stopping rule, so the (data-
        # dependent) iteration count is discovered independently by both
        # engines and the hash check covers the full tol semantics.
        "pagerank_converged": o.pagerank_converged_sql(),
        "eigenvector_top20": o.eigenvector_top20_sql(),
        # Nondeterministic community detection: side-channel property
        # oracles — the Spark query materializes its labels to a parquet
        # side channel and returns the partition-property summary
        # (properness, community count, modularity, coverage); DuckDB
        # recomputes the identical summary from (labels parquet, edges).
        "plm_labels": o.community_summary_sql(
            _side_channel("plm_labels")
        ),
        "leiden_labels": o.community_summary_sql(
            _side_channel("leiden_labels")
        ),
        "lme_labels": o.community_summary_sql(
            _side_channel("lme_labels")
        ),
        "agglomerative_labels": o.community_summary_sql(
            _side_channel("agglomerative_labels")
        ),
    }
