"""WaveNet stream multiplexer: N concurrent sessions, one batched program.

The load-bearing property is ISOLATION: a session's audio is a pure
function of (conditioning, key) — bitwise independent of which other
slots are live, when it joined, and which slot it landed on. Everything
else (slot reuse, trimming, queueing) rides on that.
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.wavenet import WaveNet
from neural_sound_generation_tpu.serving import WaveNetStreamMux


@pytest.fixture(scope="module")
def tiny():
    model = WaveNet(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_out_channels=8, out_channels=30, kernel_size=2,
        cin_channels=4, gin_channels=-1, scalar_input=True,
        upsample_scales=(2, 2),
    )
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 4))
    variables = model.init(jax.random.PRNGKey(0), x0, c0, None)
    return model, variables


def _mux(model, variables, slots=4):
    # l_max = (1.0 * 256) // 32 * 32 = 256 samples (8 chunks)
    return WaveNetStreamMux(
        model, variables, chunk=32, slots=slots, dtype=None,
        max_seconds=1.0, sample_rate=256,
    )


def _cond(seed, frames=16):
    return jnp.asarray(
        np.random.RandomState(seed).randn(frames, 4).astype(np.float32)
    )


def _collect(gen):
    return np.concatenate(list(gen))


def test_session_length_and_range(tiny):
    model, variables = tiny
    mux = _mux(model, variables)
    out = _collect(mux.open(_cond(0, frames=15), jax.random.PRNGKey(7)))
    assert out.shape == (15 * 4,)  # upsample x4, final chunk trimmed
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0


def test_deterministic_per_key(tiny):
    model, variables = tiny
    mux = _mux(model, variables)
    a = _collect(mux.open(_cond(1), jax.random.PRNGKey(3)))
    b = _collect(mux.open(_cond(1), jax.random.PRNGKey(3)))
    c = _collect(mux.open(_cond(1), jax.random.PRNGKey(4)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # key actually drives the sampling


def test_isolation_from_concurrent_sessions(tiny):
    """A session's output is bitwise identical whether it runs alone or
    concurrently with other sessions in neighboring slots."""
    model, variables = tiny
    mux = _mux(model, variables)
    solo = _collect(mux.open(_cond(2), jax.random.PRNGKey(11)))

    results = {}

    def run(name, seed, key):
        results[name] = _collect(
            mux.open(_cond(seed), jax.random.PRNGKey(key))
        )

    threads = [
        threading.Thread(target=run, args=("a", 2, 11)),
        threading.Thread(target=run, args=("b", 5, 12)),
        threading.Thread(target=run, args=("c", 6, 13)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    np.testing.assert_array_equal(results["a"], solo)
    assert results["b"].shape == solo.shape
    assert not np.array_equal(results["b"], results["c"])


def test_more_sessions_than_slots(tiny):
    """Sessions queue for slots and every one completes (slot reuse)."""
    model, variables = tiny
    mux = _mux(model, variables, slots=2)
    results = [None] * 5

    def run(i):
        results[i] = _collect(
            mux.open(_cond(10 + i), jax.random.PRNGKey(i))
        )

    threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    for r in results:
        assert r is not None and r.shape == (16 * 4,)
    # and the mux drained completely
    assert mux.active == 0


def test_capacity_guard(tiny):
    model, variables = tiny
    mux = _mux(model, variables)
    with pytest.raises(ValueError, match="slot capacity"):
        mux.open(_cond(0, frames=100), jax.random.PRNGKey(0))  # 400 > 256


def test_discrete_output_mode(tiny):
    """CE/mulaw-quantize models stream integer sample ids."""
    model = WaveNet(
        layers=2, stacks=1, residual_channels=8, gate_channels=16,
        skip_out_channels=8, out_channels=16, kernel_size=2,
        cin_channels=4, gin_channels=-1, scalar_input=False,
        quantize_channels=16, upsample_scales=(2, 2),
    )
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8), jnp.int32), False)
    c0 = jnp.zeros((1, 2, 4))
    variables = model.init(jax.random.PRNGKey(0), x0, c0, None)
    mux = _mux(model, variables, slots=2)
    out = _collect(mux.open(_cond(3, frames=9), jax.random.PRNGKey(5)))
    assert out.shape == (9 * 4,)
    assert out.dtype in (np.int32, np.int64)
    assert (out >= 0).all() and (out < 16).all()


def test_slot_reuse_determinism_hammer(tiny):
    """Regression: repeated sequential sessions (same cond, same key) must
    be bitwise identical. Each reuses slot 0 right after the previous
    occupant finished; before mux.py snapshotted _pos/_fresh at dispatch,
    the async H2D transfer could read the buffers after the worker reset
    them, silently dropping the fresh-slot state zeroing and leaking the
    previous session's WaveNet state into the first chunk."""
    model, variables = tiny
    mux = _mux(model, variables)
    first = _collect(mux.open(_cond(8), jax.random.PRNGKey(21)))
    for _ in range(7):
        again = _collect(mux.open(_cond(8), jax.random.PRNGKey(21)))
        np.testing.assert_array_equal(first, again)


def test_capacity_honors_stated_seconds_bound(tiny):
    """Regression: the slot capacity is CEIL(max_seconds*sr/chunk) chunks,
    so an utterance within max_seconds is always admitted. With a floor, a
    240-sample utterance under a 250-sample (1.0s @ 250Hz) cap was
    rejected because 250//32*32 = 224 < 240."""
    model, variables = tiny
    mux = WaveNetStreamMux(
        model, variables, chunk=32, slots=2, dtype=None,
        max_seconds=1.0, sample_rate=250,
    )
    assert mux.l_max >= 250
    out = _collect(mux.open(_cond(3, frames=60), jax.random.PRNGKey(5)))
    assert out.shape == (240,)


def test_crash_wakes_session_finished_in_lookahead(tiny):
    """Regression: a session whose FINAL chunk was dispatched (removing it
    from the slot table) but not yet delivered through the one-chunk
    lookahead must still receive the worker's exception — before the
    _inflight tracking, its consumer blocked on queue.get() forever."""
    model, variables = tiny
    mux = _mux(model, variables, slots=2)
    orig = mux._mux_step
    calls = {"n": 0}
    b_queued = threading.Event()

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            # hold the first dispatch until B is queued so the crash on
            # the second dispatch deterministically overlaps A's
            # in-flight final chunk
            b_queued.wait(timeout=60)
            return orig(*a, **k)
        raise RuntimeError("injected device failure")

    mux._mux_step = boom
    results = {}

    def consume(name, gen):
        try:
            results[name] = _collect(gen)
        except Exception as e:  # noqa: BLE001
            results[name] = e

    # A finishes at the first dispatch (1 chunk = 8 frames x4 upsample);
    # B needs a second dispatch, which raises while A's final chunk is
    # still in the one-chunk lookahead.
    gen_a = mux.open(_cond(9, frames=8), jax.random.PRNGKey(1))
    ta = threading.Thread(target=consume, args=("a", gen_a))
    ta.start()
    gen_b = mux.open(_cond(9, frames=16), jax.random.PRNGKey(2))
    b_queued.set()
    tb = threading.Thread(target=consume, args=("b", gen_b))
    tb.start()
    ta.join(timeout=120)
    tb.join(timeout=120)
    assert not ta.is_alive(), "short session's consumer is still blocked"
    assert not tb.is_alive(), "long session's consumer is still blocked"
    assert isinstance(results["a"], RuntimeError)
    assert isinstance(results["b"], RuntimeError)


def test_open_rejects_malformed_key_on_caller_thread(tiny):
    """Regression: a malformed PRNG key used to blow up inside the SHARED
    worker at slot assignment, and the crash handler killed every
    concurrent stream. open() must reject it on the caller's thread."""
    model, variables = tiny
    mux = _mux(model, variables)
    with pytest.raises(ValueError, match="key"):
        mux.open(_cond(0), jnp.zeros((3,), jnp.uint32))
    # a new-style typed key is accepted (converted to raw key data)
    out = _collect(mux.open(_cond(0, frames=8), jax.random.key(9)))
    assert out.shape == (32,)


def test_max_pending_admission_control(tiny):
    """Bounded admission: once max_pending sessions are queued beyond the
    free slots, open() raises MuxOverloaded instead of growing the wait
    queue (and per-stream latency) without bound. Free slots always
    admit, even at max_pending=0."""
    from neural_sound_generation_tpu.serving import MuxOverloaded

    model, variables = tiny
    mux = WaveNetStreamMux(
        model, variables, chunk=32, slots=1, dtype=None,
        max_seconds=1.0, sample_rate=256, max_pending=1,
    )
    orig = mux._mux_step
    release = threading.Event()

    def slow(*a, **k):
        release.wait(timeout=120)
        return orig(*a, **k)

    mux._mux_step = slow
    gen_a = mux.open(_cond(0, frames=8), jax.random.PRNGKey(1))  # slot 0
    # wait until the worker has actually assigned A (pending drained)
    deadline = time.time() + 30
    while mux.active < 1 and time.time() < deadline:
        time.sleep(0.01)
    gen_b = mux.open(_cond(1, frames=8), jax.random.PRNGKey(2))  # pending 1
    with pytest.raises(MuxOverloaded, match="retry later"):
        mux.open(_cond(2, frames=8), jax.random.PRNGKey(3))
    release.set()
    assert _collect(gen_a).shape == (32,)
    assert _collect(gen_b).shape == (32,)


def test_early_close_cancels_session(tiny):
    """Round-5: an abandoned stream must FREE its slot and stop growing
    its queue — a client disconnect (or a later open() failing after
    this one was admitted) previously left the session synthesizing its
    full utterance into a queue nothing drains."""
    import time

    model, variables = tiny
    mux = _mux(model, variables, slots=2)
    # long utterance: 64 frames -> 256 samples = 8 chunks
    h = mux.open(_cond(1, frames=64), jax.random.PRNGKey(0))
    first = next(iter(h))
    assert first.shape == (32,)
    h.close()
    # the slot frees at the next chunk boundary; other sessions proceed
    deadline = time.time() + 10
    while mux.active and time.time() < deadline:
        time.sleep(0.05)
    assert mux.active == 0
    # the abandoned queue stays bounded (at most the one-chunk lookahead)
    time.sleep(0.3)
    assert h._sess.queue.qsize() <= 2

    # a fresh session still runs to completion after the cancel
    out = _collect(mux.open(_cond(2, frames=16), jax.random.PRNGKey(1)))
    assert out.shape == (16 * 4,)
    assert np.isfinite(out).all()


def test_close_before_first_chunk_cancels(tiny):
    """close() on a handle that was never iterated (the MuxOverloaded-
    after-admission path) must cancel too — a plain generator's close()
    would skip its finally entirely here."""
    import time

    model, variables = tiny
    mux = _mux(model, variables, slots=2)
    h = mux.open(_cond(3, frames=64), jax.random.PRNGKey(2))
    h.close()
    deadline = time.time() + 10
    while (mux.active or mux.pending) and time.time() < deadline:
        time.sleep(0.05)
    assert mux.active == 0 and mux.pending == 0
