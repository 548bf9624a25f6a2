from chaorec_tpu.graphs.norm_adj import (  # noqa: F401
    BipartiteGraph,
    build_norm_adj,
    node_degrees,
)
from chaorec_tpu.graphs.knn import build_knn_graph, build_sim  # noqa: F401
