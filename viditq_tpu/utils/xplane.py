"""Minimal XSpace (xplane.pb) parser — no tensorflow/xprof dependency.

jax.profiler.trace() writes <logdir>/plugins/profile/<run>/<host>.xplane.pb.
The installed tensorboard_plugin_profile in this image can't convert xplane
(its _pywrap_profiler lacks xspace_to_tools_data), so this module decodes
the few proto fields we need by hand (wire format is stable):

  XSpace:  planes = 1 (msg)
  XPlane:  id=1, name=2, lines=3 (msg), event_metadata=4 (map<int64,
           XEventMetadata>), stat_metadata=5
  XLine:   id=1, name=2, display_name=3, timestamp_ns=4, events=6 (msg)
  XEvent:  metadata_id=1, offset_ps=2, duration_ps=3, num_occurrences=5
  XEventMetadata: id=1, name=2, display_name=3

Used by benchmarks/profile_arm.py to aggregate on-device op time per
kernel — the roofline evidence the bench artifact publishes.
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer.
    Length-delimited values come back as bytes; varints as int."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def parse_xspace_op_times(path: str,
                          plane_filter: str = "TPU") -> Dict[str, dict]:
    """Aggregate event durations by event-metadata name for every plane
    whose name contains plane_filter. Returns {op_name: {"total_ps": int,
    "count": int}} summed over lines."""
    with open(path, "rb") as f:
        space = f.read()
    out: Dict[str, dict] = collections.defaultdict(
        lambda: {"total_ps": 0, "count": 0})
    for field, _wire, plane_buf in _fields(space):
        if field != 1:
            continue
        name = b""
        lines: List[bytes] = []
        meta: Dict[int, str] = {}
        for pf, _pw, pv in _fields(plane_buf):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:
                # map entry: key=1 varint, value=2 XEventMetadata
                mid, mname = None, b""
                for mf, _mw, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:
                        for ef, _ew, ev in _fields(mv):
                            if ef == 1:
                                mid = ev if mid is None else mid
                            elif ef == 2:
                                mname = ev
                if mid is not None:
                    meta[mid] = mname.decode("utf-8", "replace")
        if plane_filter not in name.decode("utf-8", "replace"):
            continue
        for line_buf in lines:
            for lf, _lw, lv in _fields(line_buf):
                if lf != 6:
                    continue
                mid = dur = 0
                occ = 1
                for ef, _ew, ev in _fields(lv):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                    elif ef == 5:
                        occ = ev
                op = meta.get(mid, f"#{mid}")
                out[op]["total_ps"] += dur
                out[op]["count"] += occ
    return dict(out)


def latest_xplane(logdir: str) -> str:
    paths = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    return max(paths, key=os.path.getmtime)


def latest_trace_json(logdir: str) -> str:
    paths = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    return max(paths, key=os.path.getmtime)


def parse_trace_json_op_times(path: str,
                              device_filter: str = "TPU") -> Dict[str, dict]:
    """Aggregate the Chrome-trace companion file (<host>.trace.json.gz) by
    op name for the device process. The axon relay's xplane.pb export ships
    event METADATA but empty XLine event lists, so this is the working
    source of device op times on that platform. Durations are microseconds.

    Returns {op_name: {total_ps, count, category, bytes}} (ps to match the
    xplane parser)."""
    import gzip
    import json
    with open(path, "rb") as f:
        data = json.load(gzip.open(f))
    events = data.get("traceEvents", [])
    dev_pids = set()
    op_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if (e.get("name") == "process_name"
                and device_filter in e.get("args", {}).get("name", "")):
            dev_pids.add(e.get("pid"))
        if (e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_tids[e.get("pid")] = e.get("tid")
    out: Dict[str, dict] = collections.defaultdict(
        lambda: {"total_ps": 0, "count": 0, "category": "", "bytes": 0})
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids.get(e.get("pid")) not in (None, e.get("tid")):
            continue
        args = e.get("args", {})
        # strip the .NN hlo instruction suffix so repeated instances of the
        # same op (scan iterations, CSE copies) aggregate together
        name = e.get("name", "?")
        base, dot, suf = name.rpartition(".")
        if dot and suf.isdigit():
            name = base
        rec = out[name]
        rec["total_ps"] += int(float(e.get("dur", 0)) * 1e6)
        rec["count"] += 1
        if not rec["category"]:
            rec["category"] = args.get("hlo_category", "")
        rec["bytes"] += int(args.get("bytes_accessed", 0) or 0)
    return dict(out)


def top_ops(logdir: str, n: int = 30,
            plane_filter: str = "TPU") -> List[dict]:
    """Top-n ops by total device time from the newest trace in logdir.
    Prefers the xplane.pb planes; falls back to the Chrome-trace companion
    when the xplane export carries no events (axon relay)."""
    try:
        times = parse_xspace_op_times(latest_xplane(logdir), plane_filter)
    except FileNotFoundError:
        times = {}
    if not times:
        times = parse_trace_json_op_times(latest_trace_json(logdir),
                                          plane_filter)
    rows = [{"op": k, "ms": v["total_ps"] / 1e9, "count": v["count"],
             **({"category": v["category"], "bytes": v["bytes"]}
                if "category" in v else {})}
            for k, v in times.items()]
    rows.sort(key=lambda r: -r["ms"])
    return rows[:n]


def category_summary(logdir: str,
                     plane_filter: str = "TPU") -> List[dict]:
    """Total device ms per hlo_category — the phase-attribution view."""
    times = parse_trace_json_op_times(latest_trace_json(logdir),
                                      plane_filter)
    agg: Dict[str, dict] = collections.defaultdict(
        lambda: {"ms": 0.0, "count": 0, "bytes": 0})
    for v in times.values():
        c = v["category"] or "?"
        agg[c]["ms"] += v["total_ps"] / 1e9
        agg[c]["count"] += v["count"]
        agg[c]["bytes"] += v["bytes"]
    rows = [{"category": k, **{kk: (round(vv, 2) if kk == "ms" else vv)
                               for kk, vv in v.items()}}
            for k, v in agg.items()]
    rows.sort(key=lambda r: -r["ms"])
    return rows
