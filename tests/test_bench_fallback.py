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


def test_looks_like_oom(bench):
    assert bench._looks_like_oom("RESOURCE_EXHAUSTED: alloc failed")
    assert bench._looks_like_oom("XlaRuntimeError: TPU device error")
    assert bench._looks_like_oom("Allocator ran out of memory")
    assert not bench._looks_like_oom("ValueError: bad shape (1, 2)")
    assert not bench._looks_like_oom("KeyError: 'guider_a'")


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
