"""graftlink — a PySpark-native link-graph analytics engine.

Built from scratch (NOT a port of igraph's C core / Graphina's Rust
crates) with the observable query semantics of igraph's core graph
suite: power-iteration PageRank (damping 0.85), connected components
via iterative min-label hash propagation (large-star/small-star),
label-propagation community detection, and triangle counting via
degree-ordered edge orientation + wedge self-join.

Design (SURVEY.md §1,§4): edges live in columnar DataFrames; the hot
iterative path runs over src-bucketed CSR-like adjacency blocks
(`adj(src, neighbors array<long>, out_deg)`) so each superstep is one
vectorized Arrow gather-scatter kernel (`mapInArrow`, numpy on Arrow
buffers — zero per-row Python UDFs) followed by a shuffle-reduce
(partial+final hash aggregation). Every iteration checkpoints state
with lineage metadata so a killed job resumes mid-algorithm.

Reference parity anchors: igraph@0.10.x src/centrality/pagerank.c,
src/connectivity/components.c, src/community/label_propagation.c,
src/properties/triangles.c (see SURVEY.md §2A — the reference checkout
at /root/reference was empty; semantics re-derived from the published
algorithms and validated against numpy/networkx oracles).
"""

from graftlink.adjacency import pack_adjacency
from graftlink.components import connected_components
from graftlink.bipartite import (
    bipartite_check,
    bipartite_projection,
    bipartite_sides,
)
from graftlink.dag import is_dag, topo_levels
from graftlink.kcore import core_numbers, k_core
from graftlink.knn import knn_graph
from graftlink.compare import compare_communities
from graftlink.matching import maximal_matching
from graftlink.relevance import unigram_logprob
from graftlink.pii import pii_signals, redact_pii
from graftlink.walks import weighted_random_walks
from graftlink.sessions import session_stats, sessionize
from graftlink.streaming import streaming_sessionize, windowed_event_counts
from graftlink.linkpred import (
    avg_neighbor_degree,
    bibcoupling,
    cocitation,
    constraint,
    dice_similarity,
    inverse_log_weighted_similarity,
    knnk,
)
from graftlink.lpa import label_propagation
from graftlink.pagerank import pagerank
from graftlink.infomap import codelength, infomap_communities
from graftlink.walktrap import walktrap_communities
from graftlink.louvain import leiden_communities, louvain_communities, modularity
from graftlink.paths import (
    betweenness_from_sources,
    bfs_distances,
    closeness_from_sources,
    eccentricity_harmonic_from_sources,
    multi_source_bfs,
    pseudo_diameter,
    sssp_weighted,
)
from graftlink.mst import minimum_spanning_forest
from graftlink.sampling import assign_splits, hash_sample
from graftlink.walks import random_walks
from graftlink.scc import strongly_connected_components
from graftlink.spectral import eigenvector_centrality, hits, katz_centrality
from graftlink.corpus import (
    curate,
    decontaminate,
    per_domain_cap,
    repetition_signals,
)
from graftlink.graphops import (
    contract_vertices,
    graph_difference,
    graph_intersection,
    graph_union,
    induced_subgraph,
)
from graftlink.metrics import assortativity_nominal, diversity, dyad_census
from graftlink.mis import greedy_coloring, maximal_independent_set
from graftlink.triads import triad_census
from graftlink.triangles import (
    four_clique_count,
    transitivity_barrat,
    triangle_count,
    triangles_per_vertex,
)
from graftlink.truss import k_truss, trussness
from graftlink.vertices import degrees, encode_vertices
from graftlink.hostgraph import (
    domain_edges,
    host_edges,
    host_harmonic,
    host_link_stats,
    host_pagerank,
)
from graftlink.ivf import ivf_topk, kmeans, kmeans_clusters
from graftlink.ppr import ppr_push
from graftlink.cyclebasis import fundamental_cycles
from graftlink.dominators import dominator_tree
from graftlink.graphml import read_gml, read_graphml, write_gml, write_graphml
from graftlink.voronoi import voronoi_communities

__all__ = [
    "pack_adjacency",
    "bipartite_check",
    "bipartite_projection",
    "bipartite_sides",
    "knn_graph",
    "pii_signals",
    "redact_pii",
    "session_stats",
    "sessionize",
    "compare_communities",
    "maximal_matching",
    "unigram_logprob",
    "weighted_random_walks",
    "streaming_sessionize",
    "windowed_event_counts",
    "connected_components",
    "strongly_connected_components",
    "label_propagation",
    "pagerank",
    "triangle_count",
    "triangles_per_vertex",
    "encode_vertices",
    "degrees",
    "core_numbers",
    "k_core",
    "bfs_distances",
    "multi_source_bfs",
    "sssp_weighted",
    "closeness_from_sources",
    "betweenness_from_sources",
    "eccentricity_harmonic_from_sources",
    "pseudo_diameter",
    "leiden_communities",
    "infomap_communities",
    "walktrap_communities",
    "codelength",
    "louvain_communities",
    "modularity",
    "hits",
    "eigenvector_centrality",
    "katz_centrality",
    "topo_levels",
    "is_dag",
    "k_truss",
    "minimum_spanning_forest",
    "cocitation",
    "bibcoupling",
    "dice_similarity",
    "inverse_log_weighted_similarity",
    "avg_neighbor_degree",
    "knnk",
    "random_walks",
    "hash_sample",
    "assign_splits",
    "dyad_census",
    "four_clique_count",
    "per_domain_cap",
    "repetition_signals",
    "decontaminate",
    "maximal_independent_set",
    "greedy_coloring",
    "induced_subgraph",
    "contract_vertices",
    "graph_union",
    "graph_intersection",
    "graph_difference",
    "triad_census",
    "trussness",
    "assortativity_nominal",
    "constraint",
    "curate",
    "diversity",
    "host_edges",
    "domain_edges",
    "host_link_stats",
    "host_pagerank",
    "host_harmonic",
    "voronoi_communities",
    "dominator_tree",
    "fundamental_cycles",
    "transitivity_barrat",
    "read_graphml",
    "write_graphml",
    "read_gml",
    "write_gml",
    "kmeans",
    "kmeans_clusters",
    "ivf_topk",
    "ppr_push",
]

__version__ = "0.1.0"
