"""Serving executor: micro-batching queue in front of a device search fn.

The reference's serving story is a benchmark binary draining a query file
in fixed batches (``main.cpp:201-250``).  A production server instead
receives queries one-by-one and must trade latency against the device's
strong preference for fixed, padded batch shapes (jit specializes per
batch size; see ``IVFIndex.compile``).  This executor is that glue:

- callers ``submit()`` single queries (or small groups) and get a
  future-like :class:`SliceFuture`; ``submit_many()`` enqueues a
  contiguous request block in one shot and hands back per-row views;
- a DISPATCH thread drains the queue into fixed-size, zero-padded device
  batches — a batch launches when full or when the oldest request exceeds
  ``max_delay_ms`` (the classic size-or-deadline policy) — and enqueues
  the in-flight device call WITHOUT waiting for it;
- a COLLECT thread drains every in-flight batch and materializes ALL of
  their results in one ``device_get`` round trip (on the axon relay each
  synchronous fetch costs a ~29-42 ms round trip REGARDLESS of payload —
  fetching per batch was the serving ceiling), then broadcasts one
  condition notify per drain; callers slice their own rows out in
  ``result()``.

Keeping up to ``inflight`` batches in flight overlaps host marshalling,
device compute, and result transfer: while batch i's results stream back,
batches i+1..i+inflight are already queued on the device (round-1 of this
executor materialized each batch before dispatching the next and topped
out at ~7K QPS on a device sustaining ~300K).

The per-request hot path is deliberately skeletal — CPython glue, not the
device, bounds the serving number.  Three generations, measured on this
host with a null engine: a ``concurrent.futures.Future`` + per-request
``set_result`` + mutexed queue topped out at ~43K glue-only QPS; slotted
handles + lock-free deque append + one ``notify_all`` per BATCH reached
~130-210K; this version (the future IS the queue item — no per-request
tuple, a type-check that skips ``np.asarray`` for float32 ndarrays, and
ONE C-level list→buffer fill per batch instead of a Python loop of row
copies) measures ~2 µs per ``submit()`` (~480K/s producer-side) and
raises the glue-only ceiling to ~340K QPS.

The executor is engine-agnostic: pass any ``fn(queries[B, D]) -> pytree``
whose leaves all have leading dimension B (both index types'
``search_device`` qualify).
"""

from __future__ import annotations

import queue as queue_mod
import threading
import time
from collections import deque
from concurrent.futures import TimeoutError as FutureTimeoutError

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BatchingExecutor", "SliceFuture"]

_F32 = np.dtype(np.float32)


def _rows_full(queue, bs: int) -> bool:
    """True if the queued ROW count reaches bs.  Deque iteration raises
    RuntimeError if the lock-free producer appends mid-scan — treat that
    as not-full: the nap-path re-check (or, worst case, the deadline)
    picks the batch up; never a hang."""
    try:
        rows = 0
        for fut in queue:
            rows += fut._m or 1
            if rows >= bs:
                return True
        return False
    except RuntimeError:
        return False


class _BatchRecord:
    """One dispatched batch: filled by the collector, read by callers."""

    __slots__ = ("ready", "leaves", "unflatten", "exc")

    def __init__(self):
        self.ready = False
        self.leaves = None
        self.unflatten = None
        self.exc = None


class SliceFuture:
    """Future-like handle for one submit(): ``result(timeout)`` /
    ``done()``.  The batch resolves as a whole (one host materialization,
    one broadcast); this handle slices its own rows out lazily on the
    calling thread.

    The handle doubles as the QUEUE ITEM (``_q`` carries the payload,
    ``_t`` the enqueue time): the submit hot path allocates exactly one
    object and performs one deque append."""

    __slots__ = ("_ex", "_rec", "_r0", "_m", "_q", "_t")

    def __init__(self, ex):
        self._ex = ex
        self._rec = None  # attached by the dispatcher
        self._r0 = 0
        self._m = 0  # 0 = single query ([D] submit), else group rows

    def done(self) -> bool:
        rec = self._rec
        return rec is not None and rec.ready

    def _wait(self, timeout):
        rec = self._rec
        if rec is None or not rec.ready:
            cond = self._ex._cond
            deadline = None if timeout is None else time.perf_counter() + timeout
            with cond:
                while True:
                    rec = self._rec
                    if rec is not None and rec.ready:
                        break
                    if deadline is None:
                        cond.wait()
                    else:
                        remaining = deadline - time.perf_counter()
                        if remaining <= 0:
                            raise FutureTimeoutError()
                        cond.wait(remaining)
        if rec.exc is not None:
            raise rec.exc
        return rec

    def result(self, timeout: float | None = None):
        rec = self._wait(timeout)
        r0 = self._r0
        if self._m == 0:
            return rec.unflatten([a[r0] for a in rec.leaves])
        return rec.unflatten([a[r0:r0 + self._m] for a in rec.leaves])


class _RowView:
    """Per-row handle minted by :meth:`BatchingExecutor.submit_many`:
    row ``j`` of a shared group future.  Resolution waits on the PARENT
    (one record, one broadcast) and slices a single row — so enqueueing
    M rows costs one queue item + M of these tiny views, not M queue
    round trips."""

    __slots__ = ("_p", "_j")

    def __init__(self, parent: SliceFuture, j: int):
        self._p = parent
        self._j = j

    def done(self) -> bool:
        return self._p.done()

    def result(self, timeout: float | None = None):
        p = self._p
        rec = p._wait(timeout)
        r = p._r0 + self._j
        return rec.unflatten([a[r] for a in rec.leaves])


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
    pack : fuse each batch's result leaves into ONE device array before
        fetching ("auto"/True; False disables).  On the axon relay a
        fetch costs ~13.6 ms PER ARRAY regardless of payload, so a
        3-leaf search result pays ~41 ms/batch where one packed array
        pays ~14 — the single largest serving-cycle term after the sync
        round trip itself.  The pack program is a jitted
        bitcast-to-int32 + concat that takes the result arrays as
        ARGUMENTS (an outer jit around ``fn`` would inline the index's
        device arrays as constants — see CLAUDE.md); the host side
        unpacks column views, so no extra copies on the result path.
        Auto-disables (permanently, first batch) when any leaf has a
        non-4-byte dtype or there is only one leaf to begin with.
    wire_dtype : dtype of the UPLOADED query batch (default float32).
        On a bandwidth-priced relay window (round-5 probe: ~24 ms/MB,
        per-array ≈ 0) the fp32 query upload is the dominant serving
        term — B=16384 x 128d x 4B = 8.4 MB ≈ 200 ms of a 252 ms cycle.
        Integral corpora (SIFT values are uint8-ranged; the synthetic
        sets round to [0, 141]) upload LOSSLESSLY as uint8 at 1/4 the
        bytes: pass ``wire_dtype=np.uint8`` and a ``fn`` whose jitted
        body casts to f32 (both index types' ``search_device`` already
        do).  The cast happens batch-at-a-time at staging-buffer fill
        (one C-level assignment), never on the per-request hot path.
    """

    def __init__(self, fn, dim: int, batch_size: int = 32,
                 max_delay_ms: float = 2.0, inflight: int = 4,
                 pack: bool | str = "auto", wire_dtype=None):
        self._fn = fn
        self.dim = int(dim)
        self.batch_size = int(batch_size)
        self.wire_dtype = np.dtype(wire_dtype) if wire_dtype is not None else _F32
        self.max_delay_s = float(max_delay_ms) / 1e3
        # Queue of SliceFuture items (payload rides on the future);
        # deque.append is GIL-atomic, so the submit path takes no lock.
        self._queue: deque = deque()
        self._has_groups = False  # any group submit seen -> row-exact fullness
        self._wake = threading.Event()
        self._cond = threading.Condition()
        self._closed = False
        self._inflight: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, inflight))
        # Pipeline counters (single-writer per field, GIL-atomic int adds;
        # incremented per BATCH/drain — never on the per-request hot path).
        self._n_batches = 0   # dispatched device batches
        self._n_rows = 0      # real rows dispatched (excl. zero padding)
        self._n_underfull = 0  # deadline-expired (underfull) launches
        self._n_drains = 0    # collector device_get round trips
        self._n_collected = 0  # batches materialized across all drains
        self._n_packed = 0    # batches whose results were pack-fused
        self._n_fused_drains = 0  # drains whose packed batches were stacked
        # Result packing (see class docstring): state machine decided on
        # the FIRST batch's result tree — "unknown" -> "on"/"off".
        self._pack_state = "unknown" if pack in ("auto", True) else "off"
        self._pack_fn = None       # jitted bitcast+concat, built lazily
        self._pack_slices = None   # [(col0, col1, np.dtype, trailing)]
        self._pack_treedef = None
        # Cross-batch drain fusion: jnp.stack n packed [B, C] results into
        # one [n, B, C] array before the drain's device_get — one per-array
        # fetch cost for the WHOLE drain instead of one per batch.  The
        # stack executes as its own tiny program (one ~2.5 ms async RPC)
        # and saves (n-1) x ~13.6 ms of fetch; jit retraces per drain size
        # n (n <= inflight, so a handful of cached variants).
        self._fuse_drains = pack in ("auto", True)
        self._stack_fn = jax.jit(jnp.stack)
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._collector = threading.Thread(target=self._collect_loop, daemon=True)
        self._dispatcher.start()
        self._collector.start()

    # ------------------------------------------------------------------ API

    def set_max_delay_ms(self, max_delay_ms: float) -> None:
        """Retune the size-or-deadline window at runtime (the open-loop
        load curve retunes per offered load — the latency knee moves
        with arrival rate, harness/bench_executor.py).  Safe live: the
        dispatcher reads ``max_delay_s`` fresh on every iteration and
        its naps are bounded, so a new window takes effect within one
        old-window nap; the wake cuts even that."""
        self.max_delay_s = float(max_delay_ms) / 1e3
        self._wake.set()

    def submit(self, query: np.ndarray) -> SliceFuture:
        """Enqueue one query [D] or a group [m, D] (m ≤ batch_size).
        Resolves to the pytree slice for these rows ([D] input → leading
        dim dropped)."""
        if self._closed:
            raise RuntimeError("executor is closed")
        q = query
        if type(q) is not np.ndarray or q.dtype is not _F32:
            q = np.asarray(q, np.float32)
        fut = SliceFuture(self)
        if q.ndim != 1:
            # Group path (rare relative to singletons — keep it off the
            # fast path).  Fullness below is detected by ITEM count (the
            # singleton fast path, where items == rows); group rows would
            # launch late, so group submits always wake the dispatcher.
            if q.ndim != 2 or not 1 <= q.shape[0] <= self.batch_size:
                raise ValueError(
                    f"expected [D] or a group of 1..batch_size="
                    f"{self.batch_size} rows, got {q.shape}"
                )
            if q.shape[1] != self.dim:
                raise ValueError(f"query dim {q.shape[1]} != {self.dim}")
            fut._m = q.shape[0]
            self._has_groups = True
        elif q.shape[0] != self.dim:
            raise ValueError(f"query dim {q.shape[0]} != {self.dim}")
        fut._q = q
        fut._t = time.perf_counter()
        queue = self._queue
        queue.append(fut)
        # Wake the dispatcher only at its decision points: the first
        # request arms the deadline, a full batch launches.  (len() of a
        # deque is O(1); waking per-append would bounce the dispatcher —
        # and the GIL — once per request.)
        ql = len(queue)
        if ql == 1 or ql >= self.batch_size or fut._m:
            self._wake.set()
        if self._closed:
            # Raced close(): the dispatcher may already have drained and
            # exited, which would strand this future forever.  Withdraw
            # the item and refuse; if the dispatcher popped it first (or
            # pops it during the scan), it WILL be served — return
            # normally in that case.
            if fut in queue:
                try:
                    queue.remove(fut)
                except ValueError:
                    return fut  # dispatcher took it concurrently
                raise RuntimeError("executor is closed")
        return fut

    def submit_many(self, queries: np.ndarray) -> list:
        """Vectorized enqueue: [M, D] (any M ≥ 1) goes in as ⌈M/batch_size⌉
        contiguous blocks — one queue item and ONE dispatcher copy per
        block — and returns M per-row handles (each resolves like a
        singleton ``submit``).  This is the bulk-arrival fast path: per
        row it costs one tiny view object instead of a full submit round
        trip."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim != 2 or q.shape[0] < 1:
            raise ValueError(f"expected [M, D] with M >= 1, got {q.shape}")
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != {self.dim}")
        out: list[_RowView] = []
        bs = self.batch_size
        for s in range(0, q.shape[0], bs):
            parent = self.submit(q[s:s + bs])
            out.extend(_RowView(parent, j) for j in range(parent._m))
        return out

    def search(self, query: np.ndarray, timeout: float = 60.0):
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(query).result(timeout=timeout)

    def stats(self) -> dict:
        """Pipeline counters since construction (snapshot/diff around a
        timed region to scope them).  ``batches_per_drain`` is the relay-
        fetch amortization the batched-drain collector exists to buy: at
        1.0 every batch pays the full sync round trip; the capacity model
        is QPS ≈ rows_per_batch · batches_per_drain / cycle."""
        b, d = self._n_batches, self._n_drains
        return {
            "batches_dispatched": b,
            "rows_dispatched": self._n_rows,
            "underfull_launches": self._n_underfull,
            "drains": d,
            "batches_collected": self._n_collected,
            "packed_batches": self._n_packed,
            "fused_drains": self._n_fused_drains,
            "avg_rows_per_batch": round(self._n_rows / b, 1) if b else 0.0,
            "batches_per_drain": round(self._n_collected / d, 2) if d else 0.0,
        }

    def close(self) -> None:
        """Drain outstanding requests, then stop the workers (idempotent)."""
        if self._closed:
            if self._dispatcher.is_alive() or self._collector.is_alive():
                self._dispatcher.join()
                self._collector.join()
            return
        self._closed = True
        self._wake.set()
        self._dispatcher.join()
        self._collector.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- packing

    def _maybe_pack(self, out):
        """Fuse a batch result pytree into one [B, C] int32 device array
        (returns ``(packed_or_out, did_pack)``).  Any failure — odd
        dtypes, non-array leaves, a pack-program error — turns packing
        off for the executor's lifetime and falls back to the plain
        multi-array path; correctness never depends on this."""
        if self._pack_state == "off":
            return out, False
        try:
            leaves, treedef = jax.tree_util.tree_flatten(out)
            if self._pack_state == "unknown":
                ok = len(leaves) >= 2 and all(
                    hasattr(a, "dtype") and hasattr(a, "ndim") and a.ndim >= 1
                    and a.shape[0] == self.batch_size
                    and np.dtype(a.dtype).itemsize == 4
                    for a in leaves
                )
                if not ok:
                    self._pack_state = "off"
                    return out, False
                self._build_pack(leaves, treedef)
                self._pack_state = "on"
            return self._pack_fn(leaves), True
        except Exception:
            self._pack_state = "off"
            return out, False

    def _build_pack(self, leaves, treedef) -> None:
        slices, o = [], 0
        for a in leaves:
            trail = tuple(int(s) for s in a.shape[1:])
            c = 1
            for s in trail:
                c *= s
            slices.append((o, o + c, np.dtype(a.dtype), trail))
            o += c
        self._pack_slices = slices
        self._pack_treedef = treedef

        @jax.jit
        def pack(ls):
            cols = []
            for a in ls:
                a2 = a.reshape((a.shape[0], -1))
                if a2.dtype != jnp.int32:
                    a2 = jax.lax.bitcast_convert_type(a2, jnp.int32)
                cols.append(a2)
            return jnp.concatenate(cols, axis=1)

        self._pack_fn = pack

    def _unpack_rows(self, arr: np.ndarray) -> list:
        """Host-side inverse of the pack program: column VIEWS of the
        fetched [B, C] int32 buffer (same-itemsize dtype views are legal
        on the contiguous-last-axis column slices; no copies unless a
        leaf has >1 trailing dim)."""
        leaves = []
        for o0, o1, dt, trail in self._pack_slices:
            col = arr[:, o0:o1]
            if dt != col.dtype:
                col = col.view(dt)
            if trail == ():
                leaves.append(col[:, 0])
            elif len(trail) == 1:
                leaves.append(col)
            else:
                leaves.append(col.reshape((arr.shape[0],) + trail))
        return leaves

    # --------------------------------------------------------------- workers

    def _take_batch(self) -> list | None:
        """Blocks until a full batch, a deadline expiry, or close+empty.
        Returns [future, ...] or None on shutdown.  The dispatcher is the
        ONLY consumer, so len()/popleft() races with the lock-free
        producer resolve safely (a momentarily-stale len only delays an
        item to the next batch)."""
        queue = self._queue
        bs = self.batch_size
        while True:
            if queue:
                try:
                    oldest = queue[0]._t
                except IndexError:
                    continue  # raced-close withdrawal emptied the queue
                # Singleton-dominated fast path: len == rows.  Once any
                # group submit has been seen, re-count rows exactly —
                # group rows would otherwise only launch on deadline
                # expiry.
                full = len(queue) >= bs or (
                    self._has_groups and _rows_full(queue, bs)
                )
                expired = (time.perf_counter() - oldest) >= self.max_delay_s
                if full or expired or self._closed:
                    # Pop-then-check (not peek-then-pop): submit()'s raced-
                    # close withdrawal calls deque.remove() concurrently, so
                    # a peeked head may not be the item popleft() returns —
                    # accounting rows from the POPPED item can never
                    # overflow the batch buffer.
                    taken, rows = [], 0
                    while queue:
                        try:
                            fut = queue.popleft()
                        except IndexError:
                            break  # raced withdrawal drained it
                        m = fut._m or 1
                        if rows + m > bs:
                            # Doesn't fit: put it back.  The dispatcher is
                            # the only left-side consumer, so appendleft
                            # restores FIFO order safely.
                            queue.appendleft(fut)
                            break
                        taken.append(fut)
                        rows += m
                    if taken:
                        return taken
                # Not full / not expired: nap until the deadline (or a
                # producer's wake — it sets the event after the append,
                # so a set between our clear and wait is never lost).
                self._wake.clear()
                if (len(queue) >= bs or self._closed
                        or (self._has_groups and _rows_full(queue, bs))):
                    continue
                remaining = self.max_delay_s - (time.perf_counter() - oldest)
                self._wake.wait(timeout=max(remaining, 1e-4))
            elif self._closed:
                return None
            else:
                self._wake.clear()
                if queue or self._closed:
                    continue
                # BOUNDED wait: submit() only sets _wake at its decision
                # points (len==1 / full / group), so two concurrent
                # singleton submits into an empty queue can both read
                # len==2 and neither signals — an untimed wait here would
                # strand them until a later full batch.  The timeout makes
                # the deadline policy self-healing at max_delay granularity.
                self._wake.wait(timeout=self.max_delay_s)

    def _dispatch_loop(self) -> None:
        while True:
            taken = self._take_batch()
            if taken is None:
                self._inflight.put(None)  # sentinel: collector drains + exits
                return
            rec = _BatchRecord()
            # Fresh buffer per batch: jnp.asarray can be ZERO-COPY (CPU
            # backend aliases the numpy buffer), so a reused staging buffer
            # would corrupt batches still in flight.  The buffer carries
            # the WIRE dtype: filling it from the f32 request rows is one
            # C-level casting assignment per batch (uint8 wire = 4x less
            # upload on a bandwidth-priced relay; see class docstring).
            buf = np.zeros((self.batch_size, self.dim), dtype=self.wire_dtype)
            r0 = 0
            groups = False
            for fut in taken:
                fut._r0 = r0
                fut._rec = rec
                if fut._m:
                    groups = True
                    buf[r0:r0 + fut._m] = fut._q
                    r0 += fut._m
                else:
                    r0 += 1
            if not groups:
                # All-singleton batch (the serving hot path): ONE C-level
                # list→array fill instead of len(taken) Python-loop row
                # copies — measured 2x faster at B=4096 and, more
                # importantly, 1 bytecode dispatch instead of ~4 per row.
                buf[:r0] = [fut._q for fut in taken]
            else:
                # Mixed batch (rare): singleton rows were skipped above —
                # fill them now (groups already copied in order).
                for fut in taken:
                    if not fut._m:
                        buf[fut._r0] = fut._q
            for fut in taken:
                fut._q = None  # release payload references early
            self._n_batches += 1
            self._n_rows += r0
            if r0 < self.batch_size:
                self._n_underfull += 1
            try:
                # Async dispatch: jax returns device futures immediately;
                # the bounded in-flight queue provides backpressure.
                out = self._fn(jnp.asarray(buf))
                out, packed = self._maybe_pack(out)
                if packed:
                    self._n_packed += 1
                # Start the device->host copies NOW so they overlap this
                # batch's compute and the next batches' dispatches.  On the
                # axon relay each SYNCHRONOUS fetch is a ~36 ms round trip
                # and a pytree of 3 leaves costs 3 of them (107 ms/batch
                # measured); async-issued copies collapse to one (~42 ms),
                # mostly hidden behind compute.
                for a in jax.tree_util.tree_leaves(out):
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        break  # non-array leaf / backend without async copy
            except Exception as e:  # propagate to every waiter in the batch
                rec.exc = e
                self._resolve(rec)
                continue
            self._inflight.put((rec, out, packed))

    def _resolve(self, rec: _BatchRecord) -> None:
        with self._cond:
            rec.ready = True
            self._cond.notify_all()

    def _collect_loop(self) -> None:
        get, get_nowait = self._inflight.get, self._inflight.get_nowait
        done = False
        while not done:
            item = get()
            if item is None:
                return
            items = [item]
            # Drain every batch already in flight and fetch ALL of their
            # results in ONE device_get: on the axon relay a synchronous
            # fetch is a ~29-42 ms ROUND TRIP regardless of payload size,
            # so the previous one-fetch-per-batch loop capped serving at
            # ~1/42ms ≈ 24 batches/s (63K QPS at B=4096) while the device
            # finished each batch in ~10 ms.  Under load the drain batches
            # up to `inflight` fetches per round trip; at low load it
            # degrades to the old per-batch behavior (no added latency).
            while True:
                try:
                    nxt = get_nowait()
                except queue_mod.Empty:
                    break
                if nxt is None:
                    done = True  # close(): finish what we hold, then exit
                    break
                items.append(nxt)
            self._n_drains += 1
            self._n_collected += len(items)
            flats, defs = [], []
            for _, out, packed in items:
                if packed:  # one pre-fused array; unpacked host-side below
                    flats.append([out])
                    defs.append(None)
                else:
                    leaves, treedef = jax.tree_util.tree_flatten(out)
                    flats.append(leaves)
                    defs.append(treedef)
            # Cross-batch fusion: >= 2 packed batches in this drain stack
            # into ONE device array so the whole drain pays one per-array
            # fetch.  A stack failure skips fusion (permanently — don't
            # re-raise per drain) but never touches correctness: `flats`
            # still holds the per-batch arrays for the fallback paths.
            packed_idx = [i for i, it in enumerate(items) if it[2]]
            fused = None
            if self._fuse_drains and len(packed_idx) >= 2:
                try:
                    fused = self._stack_fn([flats[i][0] for i in packed_idx])
                except Exception:
                    self._fuse_drains = False
            try:
                if fused is not None:
                    unpacked_idx = [i for i in range(len(items))
                                    if not items[i][2]]
                    fused_np, rest = jax.device_get(
                        (fused, [flats[i] for i in unpacked_idx]))
                    fetched = [None] * len(items)
                    for j, i in enumerate(packed_idx):
                        fetched[i] = [fused_np[j]]
                    for j, i in enumerate(unpacked_idx):
                        fetched[i] = rest[j]
                    self._n_fused_drains += 1
                else:
                    fetched = jax.device_get(flats)
            except Exception:
                fetched = None  # isolate the poisoned batch below
            if fetched is None:
                for (rec, _, packed), leaves, treedef in zip(items, flats, defs):
                    try:
                        got = jax.device_get(leaves)
                        if packed:
                            rec.leaves = self._unpack_rows(got[0])
                            rec.unflatten = self._pack_treedef.unflatten
                        else:
                            rec.leaves = got
                            rec.unflatten = treedef.unflatten
                    except Exception as e:
                        rec.exc = e
                    self._resolve(rec)
            else:
                with self._cond:  # one broadcast for the whole drain
                    for (rec, _, packed), leaves, treedef in zip(
                            items, fetched, defs):
                        if packed:
                            rec.leaves = self._unpack_rows(leaves[0])
                            rec.unflatten = self._pack_treedef.unflatten
                        else:
                            rec.leaves = leaves
                            rec.unflatten = treedef.unflatten
                        rec.ready = True
                    self._cond.notify_all()
