from rag_on_edge_tpu.parallel.mesh import make_mesh
from rag_on_edge_tpu.parallel.sharded import ShardedBruteForceIndex, ShardedIVFIndex

__all__ = ["make_mesh", "ShardedBruteForceIndex", "ShardedIVFIndex"]
