"""XPlane (xprof) trace parser — turn jax.profiler traces into per-op time
tables without tensorboard.

The remote-relay TPU transport makes wall-clock microbenchmarks unreliable
(multi-ms dispatch gaps between launches); the device trace is ground
truth for where time goes *inside* a compiled program. This reads the
`*.xplane.pb` protobuf the profiler writes (using the same hand-rolled
wire parser as utils/onnx_reader.py) and aggregates `/device:TPU:*` event
durations by HLO op name and by coarse category.

Usage:
    with mmgt_tpu.utils.profiling.trace("/tmp/t"):
        fn(*args); jax.block_until_ready(...)
    from mmgt_tpu.utils.xplane import device_op_table, summarize
    rows = device_op_table("/tmp/t")     # [(hlo_name, total_ms, count)]
    print(summarize(rows))               # category -> ms
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Tuple

from mmgt_tpu.utils.onnx_reader import _iter_fields


def _parse_line(buf: bytes, lo: int, hi: int):
    name = ""
    events = []
    for field, wt, v in _iter_fields(buf, lo, hi):
        if field == 2 and wt == 2:
            name = buf[v[0] : v[1]].decode("utf-8", "replace")
        elif field == 4 and wt == 2:  # XEvent
            mid = dur = 0
            for f2, w2, v2 in _iter_fields(buf, *v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:
                    dur = v2
            events.append((mid, dur))
    return name, events


def _parse_plane(buf: bytes, lo: int, hi: int):
    name = ""
    lines = []
    ev_meta: Dict[int, str] = {}
    for field, wt, v in _iter_fields(buf, lo, hi):
        if field == 2 and wt == 2:
            name = buf[v[0] : v[1]].decode("utf-8", "replace")
        elif field == 3 and wt == 2:
            lines.append(v)
        elif field == 4 and wt == 2:  # map<int64, XEventMetadata>
            key = None
            meta_name = ""
            for f2, w2, v2 in _iter_fields(buf, *v):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _iter_fields(buf, *v2):
                        if f3 == 2 and w3 == 2:
                            meta_name = buf[v3[0] : v3[1]].decode("utf-8", "replace")
            if key is not None:
                ev_meta[key] = meta_name
    return name, lines, ev_meta


def _find_xplane(log_dir: str) -> str:
    hits = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {log_dir}")
    return hits[-1]


def device_op_table(
    log_dir: str, plane_prefix: str = "/device:TPU"
) -> List[Tuple[str, float, int]]:
    """[(hlo_event_name, total_ms, count)] for device planes, descending."""
    path = log_dir if log_dir.endswith(".pb") else _find_xplane(log_dir)
    data = open(path, "rb").read()
    agg: Dict[str, List[float]] = {}
    for field, wt, v in _iter_fields(data, 0, len(data)):
        if field != 1 or wt != 2:
            continue
        pname, lines, ev_meta = _parse_plane(data, *v)
        if not pname.startswith(plane_prefix):
            continue
        for l in lines:
            lname, evs = _parse_line(data, *l)
            # XLA Op lines carry per-HLO events; skip step/module summary lines
            for mid, dur in evs:
                nm = ev_meta.get(mid, f"id{mid}")
                cur = agg.setdefault(nm, [0.0, 0])
                cur[0] += dur / 1e9  # ps -> ms
                cur[1] += 1
    rows = [(nm, ms, int(n)) for nm, (ms, n) in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


_CATEGORIES = [
    ("pallas/attention", re.compile(r"custom-call|tpu_custom_call")),
    ("convolution", re.compile(r"convolution")),
    ("matmul", re.compile(r"%dot|dot_general|[^a-z]dot[^a-z]")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape")),
    ("reduce/norm", re.compile(r"reduce")),
    ("elementwise-fusion", re.compile(r"fusion")),
]


def categorize(name: str) -> str:
    for cat, pat in _CATEGORIES:
        if pat.search(name):
            return cat
    if name.startswith("jit") or "(" in name[:40]:
        return "program-total"
    return "other"


def summarize(rows: List[Tuple[str, float, int]]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for nm, ms, _ in rows:
        out[categorize(nm)] = out.get(categorize(nm), 0.0) + ms
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))
