from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.models.ivf import IVFIndex

__all__ = ["BruteForceIndex", "IVFIndex"]
