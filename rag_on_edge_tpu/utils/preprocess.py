"""Dataset preprocessing for fixed-point GEMM operands.

The reference's AIE flow preprocesses SIFT for the int16 spatial GEMM
(``AMD_npu/Codes/preprocess.py``): row-L2-normalize with an 1e-8 guard
(:24-28), scale ×1000 to int16 (:31-33), and zero-pad queries/base to
row multiples of the tile grid (:9, :36-47).  The TPU has no int16 MXU
path, so the analog here produces **int8** operands (the MXU's native
narrow dtype) with the same normalize → scale → pad pipeline; the scale
is chosen so a unit-norm row maps to the full int8 range instead of the
reference's hardcoded ×1000.
"""

from __future__ import annotations

import numpy as np

__all__ = ["l2_normalize", "pad_to_multiple", "prepare_int8_operands"]


def l2_normalize(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Row-wise L2 normalization (``preprocess.py:24-28``)."""
    x = np.asarray(x, dtype=np.float32)
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + eps)


def pad_to_multiple(x: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad rows to a multiple (``preprocess.py:9``); returns x if
    already aligned."""
    pad = (-x.shape[0]) % multiple
    if not pad:
        return x
    return np.pad(x, ((0, pad), (0, 0)))


def prepare_int8_operands(
    queries: np.ndarray,
    base: np.ndarray,
    query_row_multiple: int = 32,
    base_row_multiple: int = 256,
):
    """The ``A.bin``/``B.bin`` pipeline (``preprocess.py:20-47``), int8.

    Returns (a_int8 [Mpad, D], b_int8 [Npad, D], scale) where
    ``scale = 1/127`` per unit-norm row — inner products of the int8
    operands are ``(q·b) / scale²`` up to rounding, and their top-k order
    matches the normalized fp32 order (monotone positive scaling).
    """
    a = l2_normalize(queries)
    b = l2_normalize(base)
    scale = np.float32(1.0 / 127.0)
    a_i8 = np.clip(np.round(a / scale), -127, 127).astype(np.int8)
    b_i8 = np.clip(np.round(b / scale), -127, 127).astype(np.int8)
    return (
        pad_to_multiple(a_i8, query_row_multiple),
        pad_to_multiple(b_i8, base_row_multiple),
        scale,
    )
