"""Built-in analytical algorithms (SURVEY.md §2.3 inventory).

Each algorithm follows the cited reference semantics and returns a result
DataFrame ``(vid, value)`` (the Context analog,
/root/reference/analytical_engine/core/context/vertex_data_context.h).
Join ``LinkGraph.vertices`` on ``vid`` for oids (ADD_COLUMN analog).
"""

from linkgraph.algorithms.pagerank import pagerank, pagerank_nx
from linkgraph.algorithms.wcc import wcc
from linkgraph.algorithms.cdlp import cdlp, peer_pressure
from linkgraph.algorithms.triangles import triangles, triangle_total, triangle_total_incr
from linkgraph.algorithms.traversal import bfs, sssp
from linkgraph.algorithms.degrees import degree_centrality, degree_histogram
from linkgraph.algorithms.globals import (
    density,
    reciprocity,
    average_neighbor_degree,
    rich_club_coefficient,
    s_metric,
    global_efficiency,
    wiener_index,
    local_bridges,
    is_bipartite,
)
from linkgraph.algorithms.structuralholes import effective_size, constraint
from linkgraph.algorithms.triads import triadic_census
from linkgraph.algorithms.cliques import k_clique_communities, triangle_triples
from linkgraph.algorithms.dag import (
    topological_generations,
    is_directed_acyclic_graph,
    dag_longest_path_length,
)
from linkgraph.algorithms.hits import hits
from linkgraph.algorithms.cores import core_number, k_core, k_shell, onion_layers
from linkgraph.algorithms.clustering import clustering, average_clustering, transitivity, square_clustering
from linkgraph.algorithms.centrality import eigenvector_centrality, katz_centrality
from linkgraph.algorithms.assortativity import (
    degree_assortativity_coefficient,
    average_degree_connectivity,
    attribute_assortativity_coefficient,
    numeric_assortativity_coefficient,
)
from linkgraph.algorithms.boundary import node_boundary, edge_boundary
from linkgraph.algorithms.mis import greedy_color, maximal_independent_set, dominating_set
from linkgraph.algorithms.scc import scc, condensation
from linkgraph.algorithms.truss import k_truss, truss_decomposition
from linkgraph.algorithms.betweenness import (
    betweenness_centrality,
    edge_betweenness_centrality,
)
from linkgraph.algorithms.mst import minimum_spanning_forest
from linkgraph.algorithms.louvain import louvain, louvain_canonical, louvain_phase1
from linkgraph.algorithms.lpa_u2i import lpa_u2i, lpa_u2i_vector
from linkgraph.algorithms.linkpred import (
    link_prediction,
    jaccard_coefficient,
    adamic_adar_index,
    resource_allocation_index,
    preferential_attachment,
)
from linkgraph.algorithms.voterank import voterank
from linkgraph.algorithms.paths import (
    bfs_parents,
    bfs_generic,
    dfs,
    all_simple_paths,
    sampling_path,
    sssp_predecessors,
    sssp_path,
    sssp_has_path,
    is_simple_path,
    multi_source_bfs,
    all_pairs_shortest_path_length,
    closeness_centrality,
    average_shortest_path_length,
    eccentricity,
    diameter,
    diameter_approx,
    radius,
    center,
    periphery,
    barycenter,
    descendants,
    ancestors,
    harmonic_centrality,
)

# Reference flat-name alias: graphscope.lpa IS cdlp
# (python/graphscope/analytical/app/lpa.py:27-52 dispatches algo="cdlp").
lpa = cdlp

__all__ = [
    "pagerank",
    "lpa",
    "pagerank_nx",
    "wcc",
    "cdlp",
    "peer_pressure",
    "greedy_color",
    "k_truss",
    "truss_decomposition",
    "maximal_independent_set",
    "dominating_set",
    "triangles",
    "triangle_total",
    "triangle_total_incr",
    "bfs",
    "sssp",
    "degree_centrality",
    "hits",
    "core_number",
    "k_core",
    "k_shell",
    "onion_layers",
    "clustering",
    "average_clustering",
    "transitivity",
    "eigenvector_centrality",
    "katz_centrality",
    "degree_assortativity_coefficient",
    "average_degree_connectivity",
    "node_boundary",
    "edge_boundary",
    "scc",
    "condensation",
    "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient",
    "bfs_parents",
    "bfs_generic",
    "dfs",
    "all_simple_paths",
    "sssp_predecessors",
    "sssp_path",
    "sssp_has_path",
    "is_simple_path",
    "multi_source_bfs",
    "all_pairs_shortest_path_length",
    "closeness_centrality",
    "average_shortest_path_length",
    "eccentricity",
    "diameter",
    "diameter_approx",
    "radius",
    "center",
    "periphery",
    "barycenter",
    "descendants",
    "ancestors",
    "harmonic_centrality",
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "minimum_spanning_forest",
    "lpa_u2i",
    "lpa_u2i_vector",
    "sampling_path",
    "louvain",
    "louvain_canonical",
    "louvain_phase1",
    "link_prediction",
    "jaccard_coefficient",
    "adamic_adar_index",
    "resource_allocation_index",
    "preferential_attachment",
    "voterank",
    "density",
    "reciprocity",
    "rich_club_coefficient",
    "s_metric",
    "global_efficiency",
    "average_neighbor_degree",
    "wiener_index",
    "local_bridges",
    "is_bipartite",
    "degree_histogram",
    "effective_size",
    "constraint",
    "triadic_census",
    "topological_generations",
    "k_clique_communities",
    "triangle_triples",
    "is_directed_acyclic_graph",
    "dag_longest_path_length",
    "square_clustering",
]
