from rag_on_edge_tpu.runtime.oracle import oracle_search

__all__ = ["oracle_search"]
