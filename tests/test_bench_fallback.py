"""bench.py resilience logic (driver-critical: the end-of-round bench must
always record a number even when the shared relay chip is degraded —
PERF.md round-4 HBM note)."""
import sys

import pytest


@pytest.fixture()
def bench():
    sys.path.insert(0, "/root/repo")
    import bench as b

    return b


def test_oom_kind(bench):
    assert bench._oom_kind("RESOURCE_EXHAUSTED: alloc failed") == "strong"
    assert bench._oom_kind("XlaRuntimeError: TPU device error") == "strong"
    assert bench._oom_kind("Allocator ran out of memory") == "strong"
    # ambiguous needles (also cover relay HTTP 500s) only earn ONE retry
    assert bench._oom_kind("Allocator retry failed") == "weak"
    assert bench._oom_kind("INTERNAL: relay fault") == "weak"
    assert bench._oom_kind("ValueError: bad shape (1, 2)") == "no"
    assert bench._oom_kind("KeyError: 'guider_a'") == "no"


def test_weak_fault_single_retry(bench, monkeypatch):
    calls = []

    def fake_bench_audio2vid(fixture=False):
        calls.append(bench.MICROBATCH)
        raise RuntimeError("INTERNAL: something relay-ish")

    monkeypatch.setattr(bench, "bench_audio2vid", fake_bench_audio2vid)
    monkeypatch.setattr(bench, "MICROBATCH", 5)
    with pytest.raises(RuntimeError):
        bench._audio2vid_with_oom_fallback()
    assert calls == [5, 3]  # one retry, not the whole ladder


def test_ladder_from_large_start(bench, monkeypatch):
    calls = []

    def fake_bench_audio2vid(fixture=False):
        calls.append(bench.MICROBATCH)
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "bench_audio2vid", fake_bench_audio2vid)
    monkeypatch.setattr(bench, "MICROBATCH", 8)
    with pytest.raises(RuntimeError):
        bench._audio2vid_with_oom_fallback()
    assert calls == [8, 4, 3, 2, 1]  # halving first, no jump straight to 3


def test_fallback_retries_oom_at_smaller_microbatch(bench, monkeypatch):
    calls = []

    def fake_bench_audio2vid(fixture=False):
        calls.append(bench.MICROBATCH)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on HBM")
        return 1.0, {"stage2_s": 1.0}, 2.0

    monkeypatch.setattr(bench, "bench_audio2vid", fake_bench_audio2vid)
    monkeypatch.setattr(bench, "MICROBATCH", 5)
    best, comp, compile_s = bench._audio2vid_with_oom_fallback()
    assert calls == [5, 3]
    assert comp["microbatch_fallback"] == 3
    assert best == 1.0


def test_fallback_reraises_non_oom(bench, monkeypatch):
    def fake_bench_audio2vid(fixture=False):
        raise ValueError("bad shape")

    monkeypatch.setattr(bench, "bench_audio2vid", fake_bench_audio2vid)
    monkeypatch.setattr(bench, "MICROBATCH", 5)
    with pytest.raises(ValueError):
        bench._audio2vid_with_oom_fallback()


def test_fallback_exhausts_and_reraises(bench, monkeypatch):
    calls = []

    def fake_bench_audio2vid(fixture=False):
        calls.append(bench.MICROBATCH)
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "bench_audio2vid", fake_bench_audio2vid)
    monkeypatch.setattr(bench, "MICROBATCH", 5)
    with pytest.raises(RuntimeError):
        bench._audio2vid_with_oom_fallback()
    assert calls == [5, 3, 2, 1]
