"""Data-parallel pipeline runner (Beam-equivalent driver surface)."""
import threading

import pytest

from fv3net_tpu.pipelines.runner import (
    run_pipeline,
    summarize,
    with_exponential_backoff,
)


def test_runs_all_items_in_parallel_and_sinks():
    seen = {}
    lock = threading.Lock()

    def sink(key, value):
        with lock:
            seen[key] = value

    results = run_pipeline(list(range(20)), lambda i: i * i, sink=sink,
                           max_workers=8)
    assert all(r.ok for r in results)
    assert seen == {i: i * i for i in range(20)}
    s = summarize(results)
    assert s["n_ok"] == 20 and s["n_failed"] == 0


def test_retries_transient_failures():
    attempts = {}
    lock = threading.Lock()

    def flaky(i):
        with lock:
            attempts[i] = attempts.get(i, 0) + 1
            if i == 3 and attempts[i] < 3:
                raise RuntimeError("transient")
        return i

    results = run_pipeline(list(range(5)), flaky, num_retries=2,
                           base_delay=0.0)
    assert all(r.ok for r in results)
    assert attempts[3] == 3
    assert [r.attempts for r in results if r.key == 3] == [3]


def test_dead_letter_accounting():
    def bad(i):
        if i % 2:
            raise ValueError(f"item {i}")
        return i

    results = run_pipeline(list(range(6)), bad, num_retries=1,
                           base_delay=0.0)
    s = summarize(results)
    assert s["n_failed"] == 3 and s["failed_keys"] == [1, 3, 5]
    assert all(not r.ok for r in results if r.key % 2)


def test_with_exponential_backoff_raises_after_limit():
    calls = []

    def always_fails():
        calls.append(1)
        raise RuntimeError("nope")

    wrapped = with_exponential_backoff(always_fails, num_retries=3,
                                       base_delay=0.0)
    with pytest.raises(RuntimeError):
        wrapped()
    assert len(calls) == 4
