from rag_on_edge_tpu.runtime.executor import BatchingExecutor
from rag_on_edge_tpu.runtime.oracle import oracle_search

__all__ = ["BatchingExecutor", "oracle_search"]
