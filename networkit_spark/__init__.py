"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query capabilities of NetworKit (reference: bernlu/networkit,
surveyed in SURVEY.md) as idiomatic PySpark DataFrame programs over an edge
table derived from Common-Crawl-style web pages:

- power-iteration PageRank with sink handling and L1/L2 convergence norms
  (reference semantics: networkit/cpp/centrality/PageRank.cpp:21-134)
- hash-min connected components
  (networkit/cpp/components/ParallelConnectedComponents.cpp:21-84)
- label propagation community detection (PLP)
  (networkit/cpp/community/PLP.cpp:18-133)
- degree-ordered triangle counting / clustering coefficients
  (networkit/cpp/global/ClusteringCoefficient.cpp:164-207)

This is NOT a port: the reference is a shared-memory C++ adjacency-list
library; this engine is declarative DataFrame plans (Catalyst-optimized,
whole-stage-codegen'd) plus vectorized Arrow UDFs where Spark lacks an
operator, designed for a 1000-executor cluster over ~100 TB of pages.
"""

from networkit_spark.graph import Graph
from networkit_spark.session import get_spark
from networkit_spark.operators.pagerank import pagerank, pagerank_fixed, PageRankResult
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.labelprop import label_propagation
from networkit_spark.operators.triangles import (
    triangle_counts,
    global_clustering_coefficient,
    local_clustering_coefficients,
)
from networkit_spark.operators.centrality import degree_centrality, eigenvector_centrality
from networkit_spark.operators.quality import (
    modularity,
    coverage,
    equal_clusterings,
    is_proper_clustering,
)
from networkit_spark.operators.dedup import (
    dedup_exact,
    near_duplicates,
    minhash_signatures,
    simhash,
)
from networkit_spark.operators.similarity import brute_force_topk, lsh_topk
from networkit_spark.operators.scc import strongly_connected_components
from networkit_spark.operators.traversal import (
    bfs_distances,
    is_bipartite,
    shortest_paths,
    topological_sort,
)
from networkit_spark.operators.centrality import core_decomposition, katz_centrality
from networkit_spark.operators.labelprop_async import label_propagation_async
from networkit_spark.operators.triangles import (
    extract_largest_connected_component,
    triangle_edge_scores,
)
from networkit_spark.operators.plm import plm
from networkit_spark.operators.leiden import leiden
from networkit_spark.operators.coarsening import coarsen, prolong
from networkit_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sampled_frame_features,
    synthetic_media,
)
from networkit_spark.sources.bucketed import (
    read_bucketed_graph,
    write_edges_bucketed,
)
from networkit_spark.operators.distances import (
    closeness_centrality,
    diameter_double_sweep,
    diameter_exact,
    eccentricities,
    effective_diameter_approx,
    effective_diameter_exact,
    harmonic_closeness,
    multi_source_bfs,
    neighborhood_function,
    neighborhood_function_approx,
)
from networkit_spark.operators.betweenness import (
    betweenness_centrality,
    estimate_betweenness,
)
from networkit_spark.operators.correlation import (
    attribute_assortativity,
    degree_assortativity,
    nominal_assortativity,
)
from networkit_spark.operators.spanning import maximum_spanning_forest, spanning_forest
from networkit_spark.operators.matching import local_max_matching
from networkit_spark.operators.sparsification import (
    adamic_adar_scores,
    global_threshold_filter,
    jaccard_similarity_scores,
    local_degree_scores,
    scan_similarity_scores,
)

__all__ = [
    "Graph",
    "get_spark",
    "pagerank",
    "pagerank_fixed",
    "PageRankResult",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "global_clustering_coefficient",
    "local_clustering_coefficients",
    "degree_centrality",
    "eigenvector_centrality",
    "modularity",
    "coverage",
    "equal_clusterings",
    "is_proper_clustering",
    "dedup_exact",
    "near_duplicates",
    "minhash_signatures",
    "simhash",
    "brute_force_topk",
    "lsh_topk",
    "strongly_connected_components",
    "bfs_distances",
    "shortest_paths",
    "is_bipartite",
    "topological_sort",
    "katz_centrality",
    "core_decomposition",
    "label_propagation_async",
    "triangle_edge_scores",
    "extract_largest_connected_component",
    "plm",
    "leiden",
    "coarsen",
    "prolong",
    "multi_source_bfs",
    "closeness_centrality",
    "harmonic_closeness",
    "eccentricities",
    "diameter_exact",
    "diameter_double_sweep",
    "effective_diameter_exact",
    "effective_diameter_approx",
    "neighborhood_function",
    "neighborhood_function_approx",
    "betweenness_centrality",
    "estimate_betweenness",
    "attribute_assortativity",
    "degree_assortativity",
    "nominal_assortativity",
    "maximum_spanning_forest",
    "spanning_forest",
    "local_max_matching",
    "scan_similarity_scores",
    "jaccard_similarity_scores",
    "local_degree_scores",
    "adamic_adar_scores",
    "global_threshold_filter",
]

__version__ = "0.1.0"
