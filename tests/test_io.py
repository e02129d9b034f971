import numpy as np
import pytest

from rag_on_edge_tpu.utils import io


def test_fvecs_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(17, 128)).astype(np.float32)
    path = tmp_path / "x.fvecs"
    io.write_fvecs(path, arr)
    back = io.read_fvecs(path)
    np.testing.assert_array_equal(arr, back)


def test_ivecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 10_000, size=(9, 100)).astype(np.int32)
    path = tmp_path / "gt.ivecs"
    io.write_ivecs(path, arr)
    np.testing.assert_array_equal(arr, io.read_ivecs(path))


def test_read_max_vectors(tmp_path, rng):
    arr = rng.normal(size=(10, 4)).astype(np.float32)
    path = tmp_path / "x.fvecs"
    io.write_fvecs(path, arr)
    np.testing.assert_array_equal(arr[:3], io.read_fvecs(path, max_vectors=3))


def test_truncated_file_rejected(tmp_path, rng):
    arr = rng.normal(size=(4, 8)).astype(np.float32)
    path = tmp_path / "x.fvecs"
    io.write_fvecs(path, arr)
    data = path.read_bytes()
    path.write_bytes(data[:-4])
    with pytest.raises(ValueError, match="truncated|multiple"):
        io.read_fvecs(path)


def test_inconsistent_dims_rejected(tmp_path):
    # two records with different dim headers but same record size can't
    # happen; emulate corrupt header instead
    rec = np.array([3, 0, 0, 0, 2, 0, 0, 0], dtype=np.int32)  # dim=3 then dim=2
    path = tmp_path / "bad.fvecs"
    rec.tofile(path)
    with pytest.raises(ValueError):
        io.read_fvecs(path)


def test_empty_file(tmp_path):
    path = tmp_path / "empty.fvecs"
    path.write_bytes(b"")
    assert io.read_fvecs(path).size == 0
