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
    md, off, dur = 0, 0, 0
    for fno, wt, v in _fields(buf):
        if fno == 1:
            md = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return md, off, dur


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
            for md, off, dur in events:
                op = meta.get(md, str(md))
                t, c = totals.get(op, (0, 0))
                totals[op] = (t + dur, c + 1)
        out[name] = totals
    return out


def line_totals(path, plane_filter=("TPU", "/device")):
    """Per-line (hardware queue) busy/span time on device planes.

    Device planes put each execution stream on its own XLine (compute
    cores, DMA queues, host-transfer engines); summing per line separates
    overlapped async DMA from the serial compute path, which a flat op
    aggregation conflates. busy = Σ event durations within the line;
    span = last event end − first event start (busy ≪ span ⇒ the queue
    idles; a DMA line with busy ≈ compute-line busy is a candidate
    critical path).

    Returns {plane: [(line_name, busy_ps, span_ps, n_events, top_ops)]}
    with top_ops the line's 3 largest ops by total duration.
    """
    out = {}
    for name, lines, meta in parse_xspace(path):
        if not any(f in name for f in plane_filter):
            continue
        rows = []
        for line_name, events in lines:
            if not events:
                continue
            busy = sum(d for _, _, d in events)
            start = min(o for _, o, _ in events)
            end = max(o + d for _, o, d in events)
            per_op = {}
            for md, _, d in events:
                op = meta.get(md, str(md))
                per_op[op] = per_op.get(op, 0) + d
            top = sorted(per_op.items(), key=lambda kv: -kv[1])[:3]
            rows.append((line_name, busy, end - start, len(events), top))
        rows.sort(key=lambda r: -r[1])
        out[name] = rows
    return out


def line_op_totals(path, line_name_filter, plane_filter=("TPU", "/device")):
    """Per-op totals WITHIN one queue (XLine) — e.g. the serial compute
    line ('XLA Ops'), excluding the overlapped async-DMA queues that the
    flat op aggregation conflates. Returns {plane: {op: (ps, count)}}."""
    out = {}
    for name, lines, meta in parse_xspace(path):
        if not any(f in name for f in plane_filter):
            continue
        totals = {}
        for ln, events in lines:
            if ln != line_name_filter:  # exact: "XLA Ops" != "Async XLA Ops"
                continue
            for md, _, dur in events:
                op = meta.get(md, str(md))
                t, c = totals.get(op, (0, 0))
                totals[op] = (t + dur, c + 1)
        if totals:
            out[name] = totals
    return out


if __name__ == "__main__":
    import sys

    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    line_filter = sys.argv[3] if len(sys.argv) > 3 else None
    per_line = line_totals(sys.argv[1])
    for plane, totals in op_totals(sys.argv[1]).items():
        print("== plane:", plane)
        print("-- per queue (busy ms/step | span ms/step | events):")
        for ln, busy, span, n, top in per_line.get(plane, []):
            tops = "; ".join(f"{op[:40]} {ps / 1e9 / steps:.2f}" for op, ps in top)
            print(
                f"  {busy / 1e9 / steps:8.3f} | {span / 1e9 / steps:8.3f} "
                f"| x{n // steps:<4d} {ln[:28]:28s} top: {tops}"
            )
        if line_filter:
            print(f"-- per op within queue '{line_filter}' (serial time):")
            sub = line_op_totals(sys.argv[1], line_filter).get(plane, {})
            items = sorted(sub.items(), key=lambda kv: -kv[1][0])
            tot = sum(t for t, _ in sub.values())
            print(f"queue total: {tot / 1e9 / steps:.2f} ms/step")
            for op, (ps, c) in items[:40]:
                print(f"{ps / 1e9 / steps:9.3f} ms/step x{c // steps:<5d} {op[:110]}")
        else:
            print("-- per op (flat, overlapped queues conflated):")
            items = sorted(totals.items(), key=lambda kv: -kv[1][0])
            tot = sum(t for t, _ in totals.values())
            print(f"total accounted: {tot / 1e9 / steps:.2f} ms/step")
            for op, (ps, c) in items[:40]:
                print(f"{ps / 1e9 / steps:9.3f} ms/step x{c // steps:<5d} {op[:110]}")
