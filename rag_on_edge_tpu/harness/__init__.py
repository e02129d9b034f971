from rag_on_edge_tpu.harness import timing

__all__ = ["timing"]
