"""Minimal XSpace (jax.profiler trace) parser — per-op device time tables.

``jax.profiler.start_trace`` writes an ``*.xplane.pb`` protobuf. The usual
readers (TensorBoard profile plugin / tensorflow) are heavyweight and
version-fragile, so this module decodes the protobuf wire format directly
(the XSpace schema is stable) and aggregates device-op self times. This is
the framework's per-op profiling surface — the reference has no profiling
at all (SURVEY.md section 5).

Schema subset (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes = 1 (XPlane)
  XPlane: id=1, name=2, lines=3 (XLine), event_metadata=4 (map<int64,
          XEventMetadata>: entry{key=1, value=2})
  XEventMetadata: id=1, name=2
  XLine: name=2, events=4 (XEvent)
  XEvent: metadata_id=1, duration_ps=3
"""

from __future__ import annotations

import glob
import os
from typing import Iterator


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message payload."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # groups (3/4) don't occur in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _event_meta(buf: bytes) -> tuple[int, str]:
    mid, name = 0, ""
    for fn, _, v in _fields(buf):
        if fn == 1:
            mid = v
        elif fn == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_line(buf: bytes) -> tuple[str, list]:
    name, events = "", []
    for fn, _, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4:
            mid = dur = 0
            for efn, _, ev in _fields(v):
                if efn == 1:
                    mid = ev
                elif efn == 3:
                    dur = ev
            events.append((mid, dur))
    return name, events


def parse_plane(buf: bytes) -> dict:
    name, lines, meta = "", [], {}
    for fn, _, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(_parse_line(v))
        elif fn == 4:  # map entry {key=1: int64, value=2: XEventMetadata}
            for mfn, _, mv in _fields(v):
                if mfn == 2:
                    mid, mname = _event_meta(mv)
                    meta[mid] = mname
    return {"name": name, "lines": lines, "event_names": meta}


def parse_xspace(path: str) -> list[dict]:
    with open(path, "rb") as f:
        buf = f.read()
    return [parse_plane(v) for fn, _, v in _fields(buf) if fn == 1]


def find_xplane(logdir: str) -> str | None:
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    return paths[-1] if paths else None


def op_table(logdir_or_path: str, plane_substr: str = "TPU",
             line_substr: str = "XLA Ops") -> list[dict]:
    """Aggregate per-op total time on the matching device plane/line.

    Returns rows {name, ms, count} sorted by descending time. Durations sum
    over the whole capture (divide by captured step count per step)."""
    path = (logdir_or_path if logdir_or_path.endswith(".pb")
            else find_xplane(logdir_or_path))
    if path is None:
        raise FileNotFoundError(f"no .xplane.pb under {logdir_or_path}")
    agg: dict[str, list] = {}
    for plane in parse_xspace(path):
        if plane_substr.lower() not in plane["name"].lower():
            continue
        names = plane["event_names"]
        for lname, events in plane["lines"]:
            if line_substr.lower() not in lname.lower():
                continue
            for mid, dur in events:
                d = agg.setdefault(names.get(mid, str(mid)), [0.0, 0])
                d[0] += dur / 1e9  # ps -> ms
                d[1] += 1
    rows = [{"name": k, "ms": round(v[0], 4), "count": v[1]}
            for k, v in agg.items()]
    rows.sort(key=lambda r: -r["ms"])
    return rows


def summarize(logdir_or_path: str, top: int = 40, **kw) -> dict:
    rows = op_table(logdir_or_path, **kw)
    total = sum(r["ms"] for r in rows)
    return {"total_op_ms": round(total, 2), "ops": rows[:top]}
