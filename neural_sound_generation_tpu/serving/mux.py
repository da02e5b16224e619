"""WaveNet stream multiplexer: N concurrent realtime streams, ONE program.

Single-stream generation is latency-bound on the serial sample loop, so
batching generation costs almost nothing per extra stream on the MXU
(PERF.md: batch 8 x 16384 runs 1.72x realtime for EVERY stream vs 1.79x
for one). The reference never exploits this — its synthesis is
one-utterance-at-a-time (src/synthesis.py batch loop). The multiplexer
turns it into a serving primitive: a fixed batch of S slots steps
through one compiled chunk program on a worker thread; live sessions
occupy slots, idle slots carry zeros; a joining stream waits at most one
chunk boundary (chunk/sr seconds) for its first samples; a finishing
stream frees its slot for the next caller.

TPU-first design:

- Per-session tensors are device-resident in fixed (S, L_max, ...) slot
  buffers. Each loop iteration launches ONE jitted program that slices
  every slot's upsampled conditioning at its own offset (vmapped
  ``dynamic_slice``), draws that slot's sampling noise in-program from a
  ``fold_in``'d PRNG key, mask-zeroes freshly-joined slots' generation
  state, and scans ``chunk`` steps — no per-session host->device
  traffic and no per-session dispatch inside the loop.
- The loop runs one-chunk lookahead: chunk k+1 is dispatched before
  chunk k is materialized, so host readback rides under device compute
  (the same pattern as cli/serve._vocode_stream).
- Noise is deterministic per (session key, chunk ordinal) and
  independent across slots; a session's audio does not depend on which
  other slots are live (tests/test_serving_mux.py isolation test). This
  trades the solo streaming sampler's pre-drawn-noise bit layout for
  O(1) noise memory — mux output is deterministic but not bit-equal to
  the solo sampler under the same key.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.wavenet import (
    WaveNet,
    _draw_noise,
    _upsample_cond,
    make_chunked_generate_fn,
)


class MuxOverloaded(RuntimeError):
    """Raised by ``open`` when the pending queue is at ``max_pending``."""


class _Session:
    __slots__ = ("length", "pos", "slot", "key", "queue", "c_up",
                 "cancelled")

    def __init__(self, c_up, length: int, key):
        self.c_up = c_up  # (L_max, C) padded, device-resident until placed
        self.length = length
        self.pos = 0
        self.slot: Optional[int] = None
        self.key = key
        self.queue: queue.Queue = queue.Queue()
        self.cancelled = False


class _StreamHandle:
    """Chunk iterator for one mux session, with a ``close()`` that
    ALWAYS cancels. (A plain generator's close() on a not-yet-started
    generator skips its finally block entirely — and the session is
    admitted by ``open()``, before any iteration — so early-abandoned
    streams would keep synthesizing full utterances into queues nothing
    drains: a consumer that stops early, a client disconnect, or a
    later open() raising MuxOverloaded after this one was admitted.)"""

    def __init__(self, mux: "WaveNetStreamMux", sess: "_Session"):
        self._mux = mux
        self._sess = sess

    def __iter__(self):
        return self

    def __next__(self):
        item = self._sess.queue.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._mux._cancel(self._sess)

    def __del__(self):  # belt-and-braces for dropped references
        try:
            self.close()
        except Exception:  # pragma: no cover
            pass


class WaveNetStreamMux:
    """Multiplex up to ``slots`` concurrent generation streams.

    ``open(c, key)`` -> iterator of (chunk,) float waveform pieces for a
    (T', cin_channels) conditioning matrix (unupsampled mel frames, the
    same input the solo streaming sampler takes). While all slots are
    busy new sessions queue and are admitted at the next free chunk
    boundary; ``max_pending`` bounds that queue (admission control —
    ``open`` raises ``MuxOverloaded`` once ``max_pending`` sessions are
    already waiting, so a server can answer 503 instead of growing
    latency without bound). ``max_seconds`` bounds a single utterance
    (slot-buffer capacity); longer conditioning raises ValueError.
    """

    def __init__(self, model: WaveNet, variables, chunk: int = 4096,
                 slots: int = 8, dtype=jnp.bfloat16,
                 max_seconds: float = 10.0, sample_rate: int = 22050,
                 max_pending: Optional[int] = None):
        if model.cin_channels <= 0:
            raise ValueError("the stream mux needs local conditioning")
        self.model = model
        self.chunk = int(chunk)
        self.slots = int(slots)
        self.dtype = dtype
        self.max_pending = None if max_pending is None else int(max_pending)
        # ceil: an utterance within max_seconds must fit (a floor would
        # reject lengths between the last whole chunk and the stated cap)
        n_chunks_cap = max(1, -(-int(max_seconds * sample_rate) // self.chunk))
        self.l_max = n_chunks_cap * self.chunk
        self._variables = jax.device_put(variables)

        init_state, step_chunk, _ = make_chunked_generate_fn(
            model, chunk=self.chunk, dtype=dtype
        )
        self._state = init_state(self.slots)
        chunk_len = self.chunk
        store_dtype = dtype or jnp.float32

        def mux_step(variables, state, c_slots, keys, pos, fresh):
            prev, buf = state
            # mask-zero freshly-joined slots' generation state in-program
            keep = 1.0 - fresh.astype(buf.dtype)
            buf = buf * keep[None, :, None, None]
            prev = jnp.where(
                fresh[:, None] if prev.ndim == 2 else fresh,
                jnp.zeros_like(prev), prev,
            )
            # each slot's conditioning window at its own offset
            c_chunk = jax.vmap(
                lambda a, p: jax.lax.dynamic_slice_in_dim(a, p, chunk_len, 0)
            )(c_slots, pos)
            # per-slot noise, deterministic in (key, chunk ordinal);
            # layout/eps/mixture-count semantics live in ONE place
            # (wavenet._draw_noise) — same threefry bits at batch 1
            def noise(k, p):
                k = jax.random.fold_in(k, p // chunk_len)
                gum, unif = _draw_noise(model, k, chunk_len, batch_size=1)
                return gum[:, 0, :], unif[:, 0]

            gum, unif = jax.vmap(noise)(keys, pos)
            gum = jnp.swapaxes(gum, 0, 1)  # (chunk, S, n)
            unif = unif.T  # (chunk, S)
            return step_chunk(variables, (prev, buf), c_chunk, gum, unif, None)

        self._mux_step = jax.jit(mux_step)

        l_max = self.l_max

        @jax.jit
        def place(c_slots, padded, slot):
            return jax.lax.dynamic_update_slice_in_dim(
                c_slots, padded[None], slot, axis=0
            )

        self._place = place
        # jitted: the eager flax apply is both slow and unsupported on
        # some TPU paths (axon eager-op limitation); compiled per T'
        self._upsample = jax.jit(
            lambda v, c_: _upsample_cond(model, v, c_)
        )
        self._c_slots = jnp.zeros(
            (self.slots, l_max, model.cin_channels), store_dtype
        )
        self._keys = jnp.stack(
            [jax.random.PRNGKey(0)] * self.slots
        )
        self._pos = np.zeros(self.slots, np.int32)
        self._fresh = np.zeros(self.slots, bool)
        self._sessions: list = [None] * self.slots
        self._pending: list = []
        # sessions with a dispatched-but-undelivered chunk (the one-chunk
        # lookahead): a FINISHED session leaves _sessions at dispatch time
        # while its last chunk is still in flight, so the crash handler
        # must also wake these or their consumers block forever
        self._inflight: list = []
        self._cv = threading.Condition()
        self._started = False

    # ------------------------------------------------------------- public

    def open(self, c, key):
        """(T', cin_channels) conditioning + PRNG key -> chunk iterator.

        Upsamples on device (compiled per distinct T'), pads the result
        into a slot-capacity buffer, and queues the session; the worker
        assigns it a slot at the next chunk boundary."""
        # validate the key on the CALLER's thread: a malformed key would
        # otherwise only blow up inside the shared worker at slot
        # assignment, and the crash handler kills every concurrent stream
        key = jnp.asarray(key)
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)  # new-style typed key
        want = self._keys.shape[1:]
        if key.shape != want or key.dtype != self._keys.dtype:
            raise ValueError(
                f"key must be a raw PRNG key of shape {want} dtype "
                f"{self._keys.dtype}, got shape {key.shape} dtype {key.dtype}"
            )
        c = jnp.asarray(c)
        # shed BEFORE the device work: under a request flood the
        # upsample below costs real device time (and possibly a per-T'
        # compile over the tunnel) — rejected requests must not burn it.
        # The authoritative check re-runs under the lock at append time.
        if self.max_pending is not None:
            with self._cv:
                free = sum(x is None for x in self._sessions)
                backlog = len(self._pending) - free
            if backlog >= self.max_pending:
                raise MuxOverloaded(
                    f"{backlog + free} sessions waiting for {free} free "
                    f"slots (max_pending={self.max_pending}); retry later"
                )
        c_up = self._upsample(self._variables, c[None])[0]
        length = int(c_up.shape[0])
        if length > self.l_max:
            raise ValueError(
                f"utterance of {length} samples exceeds the mux slot "
                f"capacity {self.l_max}; raise max_seconds"
            )
        padded = jnp.zeros((self.l_max, c_up.shape[1]),
                           self._c_slots.dtype)
        padded = jax.lax.dynamic_update_slice_in_dim(
            padded, c_up.astype(padded.dtype), 0, axis=0
        )
        sess = _Session(padded, length, key)
        with self._cv:
            if self.max_pending is not None:
                # backlog = queued sessions that will NOT be absorbed by
                # currently-free slots at the next chunk boundary; a free
                # slot always admits (max_pending=0 == slots-only)
                free = sum(s is None for s in self._sessions)
                backlog = len(self._pending) - free
                if backlog >= self.max_pending:
                    raise MuxOverloaded(
                        f"{len(self._pending)} sessions waiting for "
                        f"{free} free slots "
                        f"(max_pending={self.max_pending}); retry later"
                    )
            if not self._started:
                threading.Thread(
                    target=self._worker, daemon=True, name="nsg-streammux"
                ).start()
                self._started = True
            self._pending.append(sess)
            self._cv.notify_all()
        return self._drain(sess)

    @property
    def active(self) -> int:
        with self._cv:
            return sum(s is not None for s in self._sessions)

    @property
    def pending(self) -> int:
        with self._cv:
            return len(self._pending)

    # ------------------------------------------------------------ private

    def _drain(self, sess):
        return _StreamHandle(self, sess)

    def _cancel(self, sess) -> None:
        """Free a session's slot/queue entry at the next chunk boundary
        and drop any buffered chunks. Idempotent; safe after normal
        completion (the session is no longer registered anywhere)."""
        with self._cv:
            sess.cancelled = True
            if sess in self._pending:
                self._pending.remove(sess)
            elif sess.slot is not None and (
                self._sessions[sess.slot] is sess
            ):
                self._sessions[sess.slot] = None
        # drop buffered chunks so an abandoned queue cannot grow; a
        # racing worker put after this is bounded by the one-chunk
        # lookahead (the worker checks `cancelled` before delivering)
        try:
            while True:
                sess.queue.get_nowait()
        except queue.Empty:
            pass

    def _assign_pending_locked(self):
        for slot in range(self.slots):
            if self._sessions[slot] is None and self._pending:
                sess = self._pending.pop(0)
                sess.slot = slot
                self._sessions[slot] = sess
                self._c_slots = self._place(
                    self._c_slots, sess.c_up, slot
                )
                sess.c_up = None  # placed; free the staging buffer
                self._keys = self._keys.at[slot].set(sess.key)
                self._pos[slot] = 0
                self._fresh[slot] = True

    def _worker(self):
        try:
            self._loop()
        except Exception as e:  # noqa: BLE001 — wake every caller
            with self._cv:
                victims = [s for s in self._sessions if s is not None]
                victims += self._pending
                victims += self._inflight
                self._sessions = [None] * self.slots
                self._pending = []
                self._inflight = []
                self._started = False
            seen = set()
            for s in victims:
                if id(s) not in seen:
                    seen.add(id(s))
                    s.queue.put(e)

    def _loop(self):
        prev_out = None  # (out device array, [(slot, session, valid)])
        while True:
            with self._cv:
                self._assign_pending_locked()
                active = [
                    (slot, s)
                    for slot, s in enumerate(self._sessions)
                    if s is not None
                ]
                if not active and prev_out is None:
                    self._cv.wait()
                    continue
            if active:
                # Snapshot the mutable host-side control buffers before
                # dispatch: the H2D transfer behind jnp.asarray may read
                # the numpy buffer asynchronously, and this thread mutates
                # _pos/_fresh right after dispatch — without the copy a
                # fresh slot's zero-state flag can be lost mid-transfer
                # and the joining session leaks the previous occupant's
                # generation state (seen as a nondeterministic first
                # chunk on slot reuse).
                state, out = self._mux_step(
                    self._variables, self._state, self._c_slots,
                    self._keys, jnp.asarray(np.array(self._pos)),
                    jnp.asarray(np.array(self._fresh)),
                )
                self._state = state
                try:
                    out.copy_to_host_async()
                except AttributeError:
                    pass
                self._fresh[:] = False
                deliveries = []
                for slot, s in active:
                    valid = min(self.chunk, s.length - s.pos)
                    s.pos += self.chunk
                    final = s.pos >= s.length
                    deliveries.append((slot, s, valid, final))
                    if final:
                        # no notify: the worker thread itself is the only
                        # _cv waiter (open() only ever notifies)
                        with self._cv:
                            self._sessions[slot] = None
                    else:
                        self._pos[slot] = s.pos
                cur = (out, deliveries)
            else:
                cur = None
            # every session with a dispatched-but-undelivered chunk, for
            # the crash handler (exceptions below or in the next dispatch)
            self._inflight = [
                d[1] for po in (prev_out, cur) if po is not None
                for d in po[1]
            ]
            # deliver the PREVIOUS chunk after dispatching the next one:
            # readback rides under device compute (one-chunk lookahead).
            # end-of-stream is the flag captured at dispatch time — the
            # session object's pos may already belong to a later chunk.
            if prev_out is not None:
                out_p, deliveries_p = prev_out
                arr = np.asarray(out_p)
                for slot, s, valid, final in deliveries_p:
                    if s.cancelled:
                        continue  # consumer gone; don't grow its queue
                    # copy: a view would pin the whole (slots, chunk)
                    # batch buffer for as long as ANY consumer holds its
                    # delivered chunk
                    s.queue.put(arr[slot, :valid].copy())
                    if final:
                        s.queue.put(None)
            prev_out = cur
            self._inflight = [d[1] for d in cur[1]] if cur is not None else []
