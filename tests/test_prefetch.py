"""Threaded input-prefetch semantics (train/prefetch.py).

The train drivers pipeline loader numpy work + host->device upload behind
the in-flight step (reference keeps its pipeline in torch DataLoader
workers, monocular/nnutils/train_utils.py; ours overlaps at the device
end). These pin the wrapper's contract: order, laziness bound, exception
propagation, early-break shutdown.
"""
import threading
import time

import pytest

from acfm_video_3d_reconstruction_tpu.train.prefetch import prefetch


def test_order_and_values_preserved():
    out = list(prefetch(range(17), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(17)]


def test_empty_loader():
    assert list(prefetch([], lambda x: x)) == []


def test_prep_runs_ahead_but_bounded():
    """With depth=2 the producer works ahead of the consumer, but never
    unboundedly: after the consumer stalls, at most depth+1 items are
    prepared (depth queued + one blocked on put)."""
    prepared = []
    lock = threading.Lock()

    def prep(x):
        with lock:
            prepared.append(x)
        return x

    it = prefetch(range(100), prep, depth=2)
    assert next(it) == 0
    time.sleep(0.5)  # consumer stalls; producer fills the queue and blocks
    with lock:
        n = len(prepared)
    assert 3 <= n <= 4  # 1 consumed + 2 queued (+1 possibly mid-put)
    assert list(it) == list(range(1, 100))


def test_loader_exception_propagates():
    def loader():
        yield 1
        yield 2
        raise RuntimeError("loader broke")

    it = prefetch(loader(), lambda x: x)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="loader broke"):
        next(it)


def test_prep_exception_propagates():
    def prep(x):
        if x == 3:
            raise ValueError("bad batch")
        return x

    it = prefetch(range(10), prep)
    assert next(it) == 0
    with pytest.raises(ValueError, match="bad batch"):
        list(it)


def test_early_break_stops_producer():
    """Abandoning the iterator (break mid-epoch) must stop the producer
    thread promptly rather than leaving it blocked on a full queue."""
    n_before = threading.active_count()
    for i in prefetch(range(10_000), lambda x: x, depth=2):
        if i == 5:
            break
    deadline = time.monotonic() + 5.0
    while threading.active_count() > n_before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_reiterable_loader_fresh_pass_each_call():
    """Drivers wrap the same Dataset object once per phase/epoch; each
    prefetch() call must start a fresh iteration."""

    class Loader:
        def __iter__(self):
            return iter([10, 11, 12])

    loader = Loader()
    assert list(prefetch(loader, lambda x: x + 1)) == [11, 12, 13]
    assert list(prefetch(loader, lambda x: x + 1)) == [11, 12, 13]
