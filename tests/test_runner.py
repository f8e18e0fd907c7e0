"""DagRunner unit tests (M6): dependency order, retry policy, failure
propagation (skip dependents, surface the error), duplicate/unknown guards.
Pure Python — no SparkSession.
"""

import threading
import time

import pytest

from end_to_end_azure_data_engineering_spark.plans.runner import DagRunner, Stage


def test_dependency_order():
    seen = []
    lock = threading.Lock()

    def mk(name):
        def fn():
            with lock:
                seen.append(name)
            return name
        return fn

    r = DagRunner(max_parallel=4)
    r.add(Stage("a", mk("a")))
    r.add(Stage("b", mk("b"), depends_on=["a"]))
    r.add(Stage("c", mk("c"), depends_on=["a"]))
    r.add(Stage("d", mk("d"), depends_on=["b", "c"]))
    results = r.run()
    assert set(results) == {"a", "b", "c", "d"}
    assert seen.index("a") < seen.index("b")
    assert seen.index("a") < seen.index("c")
    assert seen.index("d") == 3


def test_parallel_stages_overlap():
    running = 0
    peak = 0
    lock = threading.Lock()

    def slow():
        nonlocal running, peak
        with lock:
            running += 1
            peak = max(peak, running)
        time.sleep(0.15)
        with lock:
            running -= 1

    r = DagRunner(max_parallel=4)
    for i in range(4):
        r.add(Stage(f"s{i}", slow))
    r.run()
    assert peak >= 2  # independent stages really ran concurrently


def test_retry_then_success():
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    r = DagRunner()
    r.add(Stage("flaky", flaky, retries=3))
    assert r.run()["flaky"] == "ok"
    assert attempts["n"] == 3


def test_retries_exhausted_raises_and_skips_dependents():
    calls = []

    def always_fails():
        calls.append("fail")
        raise RuntimeError("boom")

    r = DagRunner()
    r.add(Stage("bad", always_fails, retries=2))
    r.add(Stage("child", lambda: calls.append("child"), depends_on=["bad"]))
    with pytest.raises(RuntimeError, match="bad"):
        r.run()
    assert calls == ["fail", "fail", "fail"]  # 1 + 2 retries, child never ran


def test_independent_stage_still_runs_when_sibling_fails():
    ran = []
    r = DagRunner()
    r.add(Stage("bad", lambda: (_ for _ in ()).throw(RuntimeError("x"))))
    r.add(Stage("good", lambda: ran.append("good")))
    with pytest.raises(RuntimeError):
        r.run()
    assert ran == ["good"]


def test_duplicate_stage_rejected():
    r = DagRunner()
    r.add(Stage("a", lambda: None))
    with pytest.raises(ValueError, match="duplicate"):
        r.add(Stage("a", lambda: None))


def test_unknown_dependency_rejected():
    r = DagRunner()
    r.add(Stage("a", lambda: None, depends_on=["ghost"]))
    with pytest.raises(ValueError, match="unknown"):
        r.run()
