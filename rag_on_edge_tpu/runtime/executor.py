"""Serving executor: micro-batching queue in front of a device search fn.

The reference's serving story is a benchmark binary draining a query file
in fixed batches (``main.cpp:201-250``).  A production server instead
receives queries one-by-one and must trade latency against the device's
strong preference for fixed, padded batch shapes (jit specializes per
batch size; see ``IVFIndex.compile``).  This executor is that glue:

- callers ``submit()`` single queries (or small groups) and get a Future;
- a DISPATCH thread drains the queue into fixed-size, zero-padded device
  batches — a batch launches when full or when the oldest request exceeds
  ``max_delay_ms`` (the classic size-or-deadline policy) — and enqueues
  the in-flight device call WITHOUT waiting for it;
- a COLLECT thread materializes results and resolves Futures.

Keeping up to ``inflight`` batches in flight overlaps host marshalling,
device compute, and result transfer: while batch i's results stream back,
batches i+1..i+inflight are already queued on the device (round-1 of this
executor materialized each batch before dispatching the next and topped
out at ~7K QPS on a device sustaining ~300K).

The executor is engine-agnostic: pass any ``fn(queries[B, D]) -> pytree``
whose leaves all have leading dimension B (both index types'
``search_device`` qualify).
"""

from __future__ import annotations

import queue as queue_mod
import threading
import time
from collections import deque
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
    """Size-or-deadline micro-batcher with pipelined dispatch.

    Parameters
    ----------
    fn : callable(jax.Array [batch_size, D]) -> pytree of arrays, each
        with leading dim batch_size (e.g. ``lambda q: index.search_device
        (q, k=10, nprobe=16)``).
    dim : query dimensionality.
    batch_size : the single compiled batch shape.
    max_delay_ms : launch an underfull batch once its oldest request has
        waited this long.
    inflight : device batches kept in flight (dispatch runs ahead of
        result materialization by up to this many batches).
    """

    def __init__(self, fn, dim: int, batch_size: int = 32,
                 max_delay_ms: float = 2.0, inflight: int = 4):
        self._fn = fn
        self.dim = int(dim)
        self.batch_size = int(batch_size)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self._lock = threading.Condition()
        self._queue: deque[_Pending] = deque()
        self._queued_rows = 0
        self._closed = False
        self._inflight: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, inflight))
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._collector = threading.Thread(target=self._collect_loop, daemon=True)
        self._dispatcher.start()
        self._collector.start()

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
            # Wake the dispatcher only at the two decision points (first
            # request arms the deadline; a full batch launches) — per-submit
            # notify costs dominate singleton-heavy workloads otherwise.
            if len(self._queue) == 1 or self._queued_rows >= self.batch_size:
                self._lock.notify()
        return fut

    def search(self, query: np.ndarray, timeout: float = 60.0):
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(query).result(timeout=timeout)

    def close(self) -> None:
        """Drain outstanding requests, then stop the workers (idempotent)."""
        with self._lock:
            if self._closed:
                if self._dispatcher.is_alive() or self._collector.is_alive():
                    self._dispatcher.join()
                    self._collector.join()
                return
            self._closed = True
            self._lock.notify()
        self._dispatcher.join()
        self._collector.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------------- workers

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
                            p = self._queue.popleft()
                            rows += p.query.shape[0]
                            taken.append(p)
                        self._queued_rows -= rows
                        return taken
                    self._lock.wait(timeout=self.max_delay_s / 4)
                elif self._closed:
                    return None
                else:
                    self._lock.wait()

    def _dispatch_loop(self) -> None:
        while True:
            taken = self._take_batch()
            if taken is None:
                self._inflight.put(None)  # sentinel: collector drains + exits
                return
            # Fresh buffer per batch: jnp.asarray can be ZERO-COPY (CPU
            # backend aliases the numpy buffer), so a reused staging buffer
            # would corrupt batches still in flight.
            buf = np.zeros((self.batch_size, self.dim), dtype=np.float32)
            r0 = 0
            for p in taken:
                m = p.query.shape[0]
                buf[r0:r0 + m] = p.query
                r0 += m
            try:
                # Async dispatch: jax returns device futures immediately;
                # the bounded in-flight queue provides backpressure.
                out = self._fn(jnp.asarray(buf))
            except Exception as e:  # propagate to every waiter in the batch
                for p in taken:
                    p.future.set_exception(e)
                continue
            self._inflight.put((taken, out))

    def _collect_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            taken, out = item
            try:
                leaves, treedef = jax.tree_util.tree_flatten(out)
                host = [np.asarray(a) for a in leaves]  # sync point
            except Exception as e:
                for p in taken:
                    p.future.set_exception(e)
                continue
            unflatten = treedef.unflatten
            r0 = 0
            for p in taken:
                m = p.query.shape[0]
                if p.future._single:  # type: ignore[attr-defined]
                    sl = unflatten([a[r0] for a in host])
                else:
                    sl = unflatten([a[r0:r0 + m] for a in host])
                p.future.set_result(sl)
                r0 += m
