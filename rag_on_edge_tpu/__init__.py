"""rag_on_edge_tpu — a TPU-native vector-search framework.

A from-scratch rebuild, in JAX/XLA/Pallas, of the capabilities of the
edge-NPU suite ``zyx7k/HAI-25-RAG-on-Edge`` (exact and IVF approximate
k-NN over SIFT-style embeddings):

- ``utils``    — dataset IO (fvecs/ivecs/npy), synthetic datasets, metrics.
- ``ops``      — distance, top-k, quantization, and Pallas TPU kernels.
- ``models``   — the index types: ``BruteForceIndex`` and ``IVFIndex``.
- ``parallel`` — multi-chip sharding (mesh brute force / IVF with
  all-gather top-k merge).
- ``runtime``  — native C++ exact-search oracle (the recall ground truth,
  analog of the reference's ``cpu/cpu_baseline.cpp``).
- ``harness``  — benchmark CLIs reproducing the reference's
  results.txt / metrics.txt / sweep-CSV schemas.
"""

__version__ = "0.1.0"

from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.models.ivf import IVFIndex

__all__ = ["BruteForceIndex", "IVFIndex", "__version__"]
