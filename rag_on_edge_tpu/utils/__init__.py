from rag_on_edge_tpu.utils import io, datasets, metrics

__all__ = ["io", "datasets", "metrics"]
