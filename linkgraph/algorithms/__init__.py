from linkgraph.algorithms.pagerank import pagerank, personalized_pagerank
from linkgraph.algorithms.components import connected_components
from linkgraph.algorithms.lpa import label_propagation
from linkgraph.algorithms.triangles import triangle_counts
from linkgraph.algorithms.sssp import sssp
from linkgraph.algorithms.matching import bipartite_matching
from linkgraph.algorithms.hits import hits
from linkgraph.algorithms.kcore import core_number, kcore
from linkgraph.algorithms.linkpred import link_prediction
from linkgraph.algorithms.mis import maximal_independent_set
from linkgraph.algorithms.coloring import greedy_coloring
from linkgraph.algorithms.semiclustering import semi_clustering
from linkgraph.algorithms.scc import scc
from linkgraph.algorithms.stats import degree_assortativity, modularity
from linkgraph.algorithms.betweenness import betweenness
from linkgraph.algorithms.centrality import (
    double_sweep_diameter,
    landmark_centrality,
    landmark_distances,
    pick_landmarks,
)
from linkgraph.algorithms.propagation import propagate_features
from linkgraph.algorithms.truss import ktruss
from linkgraph.algorithms.walks import random_walks

__all__ = [
    "betweenness",
    "core_number",
    "degree_assortativity",
    "double_sweep_diameter",
    "modularity",
    "ktruss",
    "landmark_centrality",
    "landmark_distances",
    "pick_landmarks",
    "propagate_features",
    "random_walks",
    "greedy_coloring",
    "hits",
    "kcore",
    "link_prediction",
    "maximal_independent_set",
    "scc",
    "semi_clustering",
    "pagerank",
    "personalized_pagerank",
    "bipartite_matching",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "sssp",
]
