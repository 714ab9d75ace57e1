"""Persistent XLA compilation cache (VERDICT r4 next #4).

The rebuild pays compile costs the eager-torch reference never does: the
full-pipeline remote TPU compile is ~5-13 min per process and the driver's
multichip gate spends ~6 min compiling the tiny train step for 8 virtual
CPU devices. `jax_compilation_cache_dir` amortizes both across processes.

Cache-dir policy:
  * CPU backend -> `<repo>/.xla_cache_cpu`, COMMITTED to git: the driver
    gate (`__graft_entry__.dryrun_multichip`) runs in this same container
    image, so pre-warmed entries turn its ~6 min compile into seconds and
    keep it far from the driver timeout (MULTICHIP_r04 rc=124 post-mortem).
    Measured: gate 5m15 cold -> 1m36 warm from one 4.5 MB entry.
  * remote TPU (axon relay): DISABLED by default — measured r5: the first
    cached bench run wrote 235 MiB of entries (compile 349 s, normal), but
    the warm rerun then TIMED OUT >560 s: executable (de)serialization
    through the relay costs more than recompiling. Opt in explicitly with
    MMGT_XLA_CACHE=<dir> on real (non-relay) TPU hosts, where the
    standard jax cache is the right default.

Entries are written on every compile >=1 s; loading a stale/foreign entry
is safe (XLA validates and falls back to compiling).
"""
from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache; returns the dir used
    (None if enabling failed). Safe to call repeatedly / before or after
    backend init; MMGT_XLA_CACHE=0 disables, MMGT_XLA_CACHE=<dir> overrides."""
    import jax

    env = os.environ.get("MMGT_XLA_CACHE", "")
    if env == "0":
        return None
    if cache_dir is None:
        cache_dir = env or None
    if cache_dir is None:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "unknown"
        if backend == "cpu":
            cache_dir = os.path.join(_REPO, ".xla_cache_cpu")
        else:
            # remote-relay TPU: cache load is slower than recompile (see
            # module docstring) — require explicit opt-in
            return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min compile time is 1s: fine — only the expensive
        # programs matter, and it keeps the committed dir small
        return cache_dir
    except Exception:  # pragma: no cover - never break callers over caching
        return None


def cache_stats(cache_dir: str) -> dict:
    """{"entries": n, "bytes": total} for a cache dir (missing -> zeros)."""
    try:
        names = os.listdir(cache_dir)
    except OSError:
        return {"entries": 0, "bytes": 0}
    total = 0
    for n in names:
        try:
            total += os.path.getsize(os.path.join(cache_dir, n))
        except OSError:
            pass
    return {"entries": len(names), "bytes": total}
