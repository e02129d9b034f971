"""Serving executor: micro-batching queue in front of a device search fn.

The reference's serving story is a benchmark binary draining a query file
in fixed batches (``main.cpp:201-250``).  A production server instead
receives queries one-by-one and must trade latency against the device's
strong preference for fixed, padded batch shapes (jit specializes per
batch size; see ``IVFIndex.compile``).  This executor is that glue:

- callers ``submit()`` single queries (or small groups) and get a Future;
- a background thread drains the queue into fixed-size, zero-padded
  device batches — a batch launches when full or when the oldest request
  exceeds ``max_delay_ms`` (the classic size-or-deadline policy);
- one compiled executable (one batch shape) serves every request.

The executor is engine-agnostic: pass any ``fn(queries[B, D]) -> pytree``
whose leaves all have leading dimension B (both index types'
``search_device`` qualify).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BatchingExecutor"]


@dataclass
class _Pending:
    query: np.ndarray  # [m, D]
    future: Future
    t_submit: float = field(default_factory=time.perf_counter)


class BatchingExecutor:
    """Size-or-deadline micro-batcher for on-device search.

    Parameters
    ----------
    fn : callable(jax.Array [batch_size, D]) -> pytree of arrays, each
        with leading dim batch_size (e.g. ``lambda q: index.search_device
        (q, k=10, nprobe=16)``).
    dim : query dimensionality.
    batch_size : the single compiled batch shape.
    max_delay_ms : launch an underfull batch once its oldest request has
        waited this long.
    """

    def __init__(self, fn, dim: int, batch_size: int = 32,
                 max_delay_ms: float = 2.0):
        self._fn = fn
        self.dim = int(dim)
        self.batch_size = int(batch_size)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self._lock = threading.Condition()
        self._queue: list[_Pending] = []
        self._queued_rows = 0
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ API

    def submit(self, query: np.ndarray) -> Future:
        """Enqueue one query [D] or a group [m, D] (m ≤ batch_size).
        Resolves to the pytree slice for these rows ([D] input → leading
        dim dropped)."""
        q = np.asarray(query, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != {self.dim}")
        if q.shape[0] > self.batch_size:
            raise ValueError(
                f"group of {q.shape[0]} exceeds batch_size={self.batch_size}; split it"
            )
        fut: Future = Future()
        fut._single = single  # type: ignore[attr-defined]
        with self._lock:
            if self._closed:
                raise RuntimeError("executor is closed")
            self._queue.append(_Pending(q, fut))
            self._queued_rows += q.shape[0]
            self._lock.notify()
        return fut

    def search(self, query: np.ndarray, timeout: float = 60.0):
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(query).result(timeout=timeout)

    def close(self) -> None:
        """Drain outstanding requests, then stop the worker (idempotent)."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._lock.notify()
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------------- worker

    def _take_batch(self) -> list[_Pending] | None:
        """Blocks until a full batch, a deadline expiry, or close+empty."""
        with self._lock:
            while True:
                if self._queue:
                    oldest = self._queue[0].t_submit
                    full = self._queued_rows >= self.batch_size
                    expired = (time.perf_counter() - oldest) >= self.max_delay_s
                    if full or expired or self._closed:
                        taken, rows = [], 0
                        while self._queue and (
                            rows + self._queue[0].query.shape[0] <= self.batch_size
                        ):
                            p = self._queue.pop(0)
                            rows += p.query.shape[0]
                            taken.append(p)
                        self._queued_rows -= rows
                        return taken
                    self._lock.wait(timeout=self.max_delay_s / 4)
                elif self._closed:
                    return None
                else:
                    self._lock.wait()

    def _run(self) -> None:
        while True:
            taken = self._take_batch()
            if taken is None:
                return
            rows = np.concatenate([p.query for p in taken], axis=0)
            pad = self.batch_size - rows.shape[0]
            if pad:
                rows = np.pad(rows, ((0, pad), (0, 0)))
            try:
                out = self._fn(jnp.asarray(rows))
                host = jax.tree_util.tree_map(np.asarray, out)
            except Exception as e:  # propagate to every waiter in the batch
                for p in taken:
                    p.future.set_exception(e)
                continue
            r0 = 0
            for p in taken:
                m = p.query.shape[0]
                sl = jax.tree_util.tree_map(
                    (lambda a, _r0=r0, _m=m: a[_r0] if p.future._single  # type: ignore[attr-defined]
                     else a[_r0:_r0 + _m]),
                    host,
                )
                p.future.set_result(sl)
                r0 += m
