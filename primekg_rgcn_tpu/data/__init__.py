from primekg_rgcn_tpu.data.graph import RelGraph, build_rel_graph, edge_arrays_from_graph

__all__ = ["RelGraph", "build_rel_graph", "edge_arrays_from_graph"]
