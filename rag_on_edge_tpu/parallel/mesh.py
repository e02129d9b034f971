"""Device-mesh helpers.

The reference's only spatial parallelism is the 4×4 AIE tile array driven by
ObjectFIFO broadcast/distribute/join (``AMD_npu/Codes/whole_array.py``,
SURVEY §2.6); its TPU-native analog is a ``jax.sharding.Mesh`` with named
axes and XLA collectives over ICI.  Vector search shards the **database**
(rows of the score GEMM's N dimension / IVF cluster slabs) across the mesh
and replicates queries — the merge is an all-gather of per-shard top-k
candidates followed by a re-selection (SURVEY §2.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "SHARD_AXIS"]

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis_name: str = SHARD_AXIS) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
