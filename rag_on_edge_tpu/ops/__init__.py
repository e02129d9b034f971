from rag_on_edge_tpu.ops import distances, quantize, topk

__all__ = ["distances", "topk", "quantize"]
