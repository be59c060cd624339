"""Minimal pure-Python parser for XLA profiler .xplane.pb traces.

The image's tensorboard_plugin_profile has no xplane_pb2 (and its other
_pb2 modules are protoc-version incompatible), so this decodes the public
xplane.proto wire format directly (XSpace -> XPlane -> XLine -> XEvent +
event_metadata). Enough to aggregate per-op self time on the TPU plane.
"""
from __future__ import annotations


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_event(buf):
    md, dur = 0, 0
    for fno, wt, v in _fields(buf):
        if fno == 1:
            md = v
        elif fno == 3:
            dur = v
    return md, dur


def parse_line(buf):
    events = []
    name = ""
    for fno, wt, v in _fields(buf):
        if fno == 4:
            events.append(parse_event(v))
        elif fno == 2:
            name = v.decode("utf-8", "replace")
    return name, events


def parse_meta_entry(buf):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fno, wt, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:  # XEventMetadata
            for f2, w2, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            k, nm = parse_meta_entry(v)
            meta[k] = nm
    return name, lines, meta


def parse_xspace(path):
    buf = open(path, "rb").read()
    planes = []
    for fno, wt, v in _fields(buf):
        if fno == 1:
            planes.append(parse_plane(v))
    return planes


def op_totals(path, plane_filter=("TPU", "/device")):
    """Aggregate duration_ps by op name on device planes.

    Returns {plane_name: {op_name: (total_ps, count)}}.
    """
    out = {}
    for name, lines, meta in parse_xspace(path):
        if not any(f in name for f in plane_filter):
            continue
        totals = {}
        for line_name, events in lines:
            for md, dur in events:
                op = meta.get(md, str(md))
                t, c = totals.get(op, (0, 0))
                totals[op] = (t + dur, c + 1)
        out[name] = totals
    return out


if __name__ == "__main__":
    import sys

    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    for plane, totals in op_totals(sys.argv[1]).items():
        print("== plane:", plane)
        items = sorted(totals.items(), key=lambda kv: -kv[1][0])
        tot = sum(t for t, _ in totals.values())
        print(f"total accounted: {tot / 1e9 / steps:.2f} ms/step")
        for op, (ps, c) in items[:50]:
            print(f"{ps / 1e9 / steps:9.3f} ms/step x{c // steps:<5d} {op[:110]}")
