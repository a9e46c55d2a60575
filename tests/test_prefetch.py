"""Tests for the background-thread batch prefetcher and the on-disk
init cache (DataLoader-worker / warm-start analogs of the reference's
opencood/tools/train.py:53-85 pipeline)."""

import time

import numpy as np
import pytest

from gencomm_tpu.data.prefetch import prefetch_iter


def test_prefetch_preserves_order_and_values():
    src = [{"x": np.full((2, 2), i)} for i in range(7)]
    out = list(prefetch_iter(iter(src), depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], src[i]["x"])


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch_iter(gen())
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_close_stops_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iter(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    # producer stopped: no further items after close settles
    assert len(produced) == n
    assert n < 1000
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_overlaps_producer_with_consumer():
    # with depth 2, the producer works ahead while the consumer sleeps
    def gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch_iter(gen(), depth=2):
        time.sleep(0.05)
    elapsed = time.perf_counter() - t0
    # serial would be ~0.4s; overlapped ~0.25s. Allow slack for CI noise.
    assert elapsed < 0.38


def test_init_cache_roundtrip(tmp_path, monkeypatch):
    import jax
    import flax.linen as nn

    from gencomm_tpu.train import trainer

    monkeypatch.setattr(trainer, "_INIT_CACHE_DIR", str(tmp_path))

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, train=True):
            x = nn.Dense(4)(batch["x"])
            x = nn.BatchNorm(use_running_average=not train)(x)
            return x

    batch = {"x": np.ones((2, 3), np.float32)}
    rng = jax.random.PRNGKey(0)
    v1 = trainer.cpu_init(Tiny(), batch, rng)
    files = list(tmp_path.glob("init_*.npz"))
    assert len(files) == 1
    v2 = trainer.cpu_init(Tiny(), batch, rng)  # cache hit
    flat1 = jax.tree_util.tree_leaves_with_path(v1)
    flat2 = jax.tree_util.tree_leaves_with_path(v2)
    assert len(flat1) == len(flat2) and len(flat1) > 0
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different seed → different cache entry
    trainer.cpu_init(Tiny(), batch, jax.random.PRNGKey(1))
    assert len(list(tmp_path.glob("init_*.npz"))) == 2


def test_multi_worker_iter_yields_all_batches():
    from gencomm_tpu.data.prefetch import multi_worker_iter

    def make_iter(w):
        import numpy as np
        for i in range(5):
            yield {"w": w, "i": i, "x": np.full((4,), w * 10 + i)}

    got = list(multi_worker_iter(make_iter, num_workers=3))
    assert len(got) == 15
    seen = {(g["w"], g["i"]) for g in got}
    assert seen == {(w, i) for w in range(3) for i in range(5)}


def test_multi_worker_iter_closes_cleanly():
    from gencomm_tpu.data.prefetch import multi_worker_iter

    def make_iter(w):
        i = 0
        while True:  # infinite producer
            yield i
            i += 1

    it = multi_worker_iter(make_iter, num_workers=2)
    vals = [next(it) for _ in range(10)]
    assert len(vals) == 10
    it.close()
