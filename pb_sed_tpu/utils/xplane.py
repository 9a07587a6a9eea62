"""Minimal XSpace (.xplane.pb) reader: per-step DEVICE time AND true
op-busy time from a JAX profiler trace, without
tensorflow/tensorboard_plugin_profile.

Hand-rolled protobuf wire decoding of the fields we need
(tsl/profiler/protobuf/xplane.proto):

    XSpace  { repeated XPlane planes = 1; }
    XPlane  { int64 id = 1; string name = 2; repeated XLine lines = 3; }
    XLine   { int64 id = 1; string name = 2; int64 timestamp_ns = 3;
              repeated XEvent events = 4; ... }
    XEvent  { int64 metadata_id = 1; int64 offset_ps = 2;
              int64 duration_ps = 3; ... }

The TPU device plane carries an "XLA Modules" line whose events are the
executed XLA programs — for the bench's train loop each event is one
train step, so the event durations ARE the per-step device times,
immune to dispatch/tunnel latency. The "XLA Ops" line carries the
individual device ops; summing the UNION of op intervals inside a module
span yields the time the device actually spent computing that program
(``module_busy``) — the direct duty-cycle measurement distinguishing a
genuinely slow program from pool time-slicing (a throttled pool shows a
long module span with a tiny op-busy fraction). Event offsets are
relative to their line's ``timestamp_ns``, so spans and ops are placed on
one absolute axis before intersecting. Best-effort: returns empty when
the schema doesn't match.
"""
from pathlib import Path


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf):
    """Yields (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire == 1:  # fixed64
            value = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            value = buf[pos:pos + length]
            pos += length
        elif wire == 5:  # fixed32
            value = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f'wire type {wire}')
        yield field, wire, value


def _parse_plane(path, plane_idx, plane):
    """Decode one XPlane message into (name, event_metadata, lines).

    ``event_metadata`` maps metadata_id -> name (bytes) from the plane's
    ``map<int64, XEventMetadata> event_metadata = 4`` field; ``lines`` is
    [(line_name, timestamp_ns, [(metadata_id, offset_ps, duration_ps)])].
    """
    name = b''
    raw_lines = []
    event_metadata = {}
    for f2, w2, v2 in iter_fields(plane):
        if f2 == 2 and w2 == 2:
            name = v2
        elif f2 == 3 and w2 == 2:
            raw_lines.append(v2)
        elif f2 == 4 and w2 == 2:  # map entry {key=1, value=XEventMetadata}
            key = None
            meta_name = b''
            for f3, w3, v3 in iter_fields(v2):
                if f3 == 1 and w3 == 0:
                    key = v3
                elif f3 == 2 and w3 == 2:
                    for f4, w4, v4 in iter_fields(v3):
                        if f4 == 2 and w4 == 2:  # XEventMetadata.name
                            meta_name = v4
            if key is not None:
                event_metadata[key] = meta_name
    lines = []
    for line in raw_lines:
        line_name = b''
        timestamp_ns = 0
        events = []
        for f3, w3, v3 in iter_fields(line):
            if f3 == 2 and w3 == 2:
                line_name = v3
            elif f3 == 3 and w3 == 0:
                timestamp_ns = v3
            elif f3 == 4 and w3 == 2:
                metadata_id = 0
                offset_ps = 0
                duration_ps = 0
                for f4, w4, v4 in iter_fields(v3):
                    if f4 == 1 and w4 == 0:
                        metadata_id = v4
                    elif f4 == 2 and w4 == 0:
                        offset_ps = v4
                    elif f4 == 3 and w4 == 0:
                        duration_ps = v4
                events.append((metadata_id, offset_ps, duration_ps))
        lines.append((line_name, timestamp_ns, events))
    return name, event_metadata, lines


def _iter_tpu_planes(trace_dir):
    """Yields (plane_key, event_metadata, lines) per TPU plane (see
    ``_parse_plane``) under ``trace_dir``."""
    for path in Path(trace_dir).rglob('*.xplane.pb'):
        buf = path.read_bytes()
        for plane_idx, (field, wire, plane) in enumerate(
                iter_fields(buf)):
            if field != 1 or wire != 2:
                continue
            name, event_metadata, lines = _parse_plane(
                path, plane_idx, plane)
            if b'TPU' not in name and b'tpu' not in name:
                continue
            yield (str(path), plane_idx, name), event_metadata, lines


def _iter_tpu_lines(trace_dir):
    """Yields (plane_key, line_name: bytes, timestamp_ns: int, events:
    list of (offset_ps, duration_ps)) for every line of every TPU plane
    under ``trace_dir``. ``plane_key`` identifies the DEVICE the line
    belongs to — intervals from different chips must never be pooled
    onto one timeline (concurrent data-parallel chips would count each
    other's compute as busy time)."""
    for plane_key, _, lines in _iter_tpu_planes(trace_dir):
        for line_name, timestamp_ns, events in lines:
            yield plane_key, line_name, timestamp_ns, [
                (off, dur) for _, off, dur in events]


def device_step_times_ms(trace_dir):
    """Per-step device times (ms) from every .xplane.pb under trace_dir.

    NOTE: pools ALL "XLA Modules" spans. Valid when one program dominates
    the trace (the train lanes); for multi-program traces (the chunked
    ensemble: one big SED program + tiny glue modules) the median lands
    on the glue — use ``module_spans_by_name``/``dominant_module_span_ms``
    there (round-4 verdict: 0.001 ms "ensemble device time").
    """
    times = []
    for _, line_name, _, events in _iter_tpu_lines(trace_dir):
        if b'XLA Modules' not in line_name:
            continue
        times.extend(duration / 1e9 for _, duration in events)  # ps->ms
    return times


def module_spans_by_name(trace_dir):
    """{module_name: [span_ms, ...]} over the "XLA Modules" events of
    every TPU plane — per-program span attribution for traces that carry
    more than one XLA program."""
    out = {}
    for _, event_metadata, lines in _iter_tpu_planes(trace_dir):
        for line_name, _, events in lines:
            if b'XLA Modules' not in line_name:
                continue
            for metadata_id, _, duration_ps in events:
                name = event_metadata.get(metadata_id, b'?').decode(
                    'utf-8', 'replace')
                out.setdefault(name, []).append(duration_ps / 1e9)
    return out


def dominant_module_span_ms(trace_dir):
    """(name, median_span_ms, n_executions) of the module with the
    largest TOTAL device time in the trace — the program under test in
    a single-workload bench trace, immune to glue-module noise."""
    by_name = module_spans_by_name(trace_dir)
    if not by_name:
        return None
    name = max(by_name, key=lambda k: sum(by_name[k]))
    spans = sorted(by_name[name])
    return name, spans[len(spans) // 2], len(spans)


def _union_length(intervals):
    """Total covered length of (start, stop) intervals."""
    total = 0
    last_stop = None
    for start, stop in sorted(intervals):
        if last_stop is None or start >= last_stop:
            total += stop - start
            last_stop = stop
        elif stop > last_stop:
            total += stop - last_stop
            last_stop = stop
    return total


def module_busy_times_ms(trace_dir):
    """Direct duty-cycle evidence: per module execution, (span_ms,
    busy_ms) where busy is the union of "XLA Ops" intervals clipped to
    the module span — the time the device genuinely computed vs the
    wall span the module occupied (pool time-slicing shows span >> busy).
    Intervals are grouped PER DEVICE PLANE: on multi-chip traces,
    pooling concurrent chips' ops onto one timeline would count other
    devices' compute as this module's busy time and invert the
    throttled-vs-slow conclusion.
    """
    import bisect
    per_plane = {}   # plane_key -> {'modules': [...], 'ops': [...]}
    for plane_key, line_name, timestamp_ns, events in \
            _iter_tpu_lines(trace_dir):
        base_ps = timestamp_ns * 1000
        entry = per_plane.setdefault(
            plane_key, {'modules': [], 'ops': []})
        if b'XLA Modules' in line_name:
            entry['modules'].extend(
                (base_ps + off, base_ps + off + dur)
                for off, dur in events)
        elif b'XLA Ops' in line_name:
            entry['ops'].extend(
                (base_ps + off, base_ps + off + dur)
                for off, dur in events)
    out = []
    for entry in per_plane.values():
        modules, ops = entry['modules'], entry['ops']
        if not modules:
            continue
        ops.sort()
        op_starts = [o[0] for o in ops]
        # prefix max of stops: ops[:i] can only reach into a span
        # starting at s if prefix_max_stop[i-1] > s (handles nested ops
        # whose immediate successors end early)
        prefix_max_stop = []
        running = 0
        for _, o_stop in ops:
            running = max(running, o_stop)
            prefix_max_stop.append(running)
        for start, stop in sorted(modules):
            # ops are sorted by start: only the [lo, hi) window can
            # intersect [start, stop) — O(log O) per module instead of
            # a full scan (traces carry 10^5+ op events)
            hi = bisect.bisect_left(op_starts, stop)
            lo = bisect.bisect_right(prefix_max_stop, start, hi=hi)
            inside = [
                (max(o_start, start), min(o_stop, stop))
                for o_start, o_stop in ops[lo:hi]
                if o_stop > start
            ]
            busy_ps = _union_length(inside)
            out.append(((stop - start) / 1e9, busy_ps / 1e9))
    return out


def op_breakdown_ms(trace_dir, top=None, collapse=True):
    """Aggregate "XLA Ops" device time by op NAME: {name: (total_ms,
    count)} sorted by total time, descending. This is the attribution
    tool that located the round-2 sort-lowered gathers: module spans say
    *how long* a program ran, this says *which HLO ops* the time went to.

    ``collapse=True`` strips trailing ``.N`` instance suffixes (XLA names
    ops ``fusion.123``/``convolution.7``) so repeated instances of the
    same op kind within a program aggregate; exact instance names are
    kept with ``collapse=False``. Multi-plane traces aggregate over all
    devices (per-device attribution rarely matters for breakdowns; use
    ``module_busy_times_ms`` for duty-cycle questions).
    """
    import re
    totals = {}
    for _, event_metadata, lines in _iter_tpu_planes(trace_dir):
        for line_name, _, events in lines:
            if b'XLA Ops' not in line_name:
                continue
            for metadata_id, _, duration_ps in events:
                name = event_metadata.get(metadata_id, b'?')
                try:
                    name = name.decode()
                except UnicodeDecodeError:
                    name = repr(name)
                if collapse:
                    name = re.sub(r'\.\d+$', '', name)
                t, c = totals.get(name, (0., 0))
                totals[name] = (t + duration_ps / 1e9, c + 1)
    out = sorted(totals.items(), key=lambda kv: -kv[1][0])
    if top:
        out = out[:top]
    return {k: (round(v[0], 3), v[1]) for k, v in out}


_ASYNC_MARKERS = ('copy-start', 'slice-start', 'copy-done',
                  'slice-done')


def _is_async_dma(name):
    """Pure-DMA op (its span is transfer wait, not compute occupancy):
    match on the op NAME (before ' = '), not the whole HLO text —
    Pallas custom calls and fusion wrappers mention
    ``calls=%async_computation`` without being DMAs themselves."""
    head = name.split(' = ')[0]
    return any(s in head for s in _ASYNC_MARKERS)


def _gaps_in_span(span, intervals, min_gap_ps):
    """Uncovered holes of (start, stop) ``span`` given sorted-or-not
    ``intervals``: [(gap_start, gap_stop)] with gap >= min_gap_ps."""
    s0, s1 = span
    gaps = []
    cur = s0
    for a, b in sorted(intervals):
        if a > cur and a - cur >= min_gap_ps and cur < s1:
            gaps.append((cur, min(a, s1)))
        cur = max(cur, b)
        if cur >= s1:
            break
    if s1 - cur >= min_gap_ps:
        gaps.append((cur, s1))
    return gaps


def stall_gaps_ms(trace_dir, min_gap_ms=0.1, top=20):
    """Where a module span is NOT covered by synchronous compute ops —
    the DMA-stall structure duty_cycle_summary cannot see (async
    copy/slice spans pad the busy union to ~1.0 even while the compute
    units wait on transfers). For the longest module span of each
    device plane: total sync-gap time and the ``top`` largest holes,
    each with the async ops whose spans cover it (the transfers being
    waited on). Found the round-3 32->30 ms GRU-residual stalls.

    Returns {'span_ms', 'sync_ms', 'gap_ms', 'gaps': [(gap_ms,
    offset_ms, [covering async op names])]} for the first TPU plane
    with a module span (empty dict otherwise).
    """
    for _, meta, lines in _iter_tpu_planes(trace_dir):
        mods, sync, asyn = [], [], []
        for line_name, ts, events in lines:
            if b'XLA Modules' in line_name:
                mods += [(off, off + dur) for _, off, dur in events]
            elif b'XLA Ops' in line_name:
                for mid, off, dur in events:
                    name = meta.get(mid, b'?').decode('utf-8', 'replace')
                    (asyn if _is_async_dma(name)
                     else sync).append((off, off + dur, name))
        if not mods:
            continue
        span = max(mods, key=lambda m: m[1] - m[0])
        ivs = [(a, b) for a, b, _ in sync
               if a >= span[0] and b <= span[1]]
        gaps = _gaps_in_span(span, ivs, int(min_gap_ms * 1e9))
        total_gap = sum(b - a for a, b in gaps)
        gaps.sort(key=lambda g: g[0] - g[1])
        out = []
        for a, b in gaps[:top]:
            cover = sorted({n.split(' = ')[0] for x, y, n in asyn
                            if x < b and y > a})
            out.append((round((b - a) / 1e9, 3),
                        round((a - span[0]) / 1e9, 3), cover[:8]))
        return {
            'span_ms': round((span[1] - span[0]) / 1e9, 3),
            'sync_ms': round(_union_length(ivs) / 1e9, 3),
            'gap_ms': round(total_gap / 1e9, 3),
            'n_gaps': len(gaps),
            'gaps': out,
        }
    return {}


def duty_cycle_summary(trace_dir, min_span_ms=0.0):
    """{'span_ms': median module span, 'busy_ms': median op-busy time,
    'duty_cycle': busy/span} over the module executions in the trace
    (empty dict when the trace carries no ops line). ``min_span_ms``
    excludes glue modules on multi-program traces (pair with
    ``dominant_module_span_ms`` to pick the threshold)."""
    pairs = module_busy_times_ms(trace_dir)
    pairs = [(s, b) for s, b in pairs if b > 0 and s >= min_span_ms]
    if not pairs:
        return {}
    import numpy as np
    spans = np.array([s for s, _ in pairs])
    busies = np.array([b for _, b in pairs])
    span = float(np.median(spans))
    busy = float(np.median(busies))
    return {
        'span_ms': round(span, 3),
        'busy_ms': round(busy, 3),
        'duty_cycle': round(busy / span, 4) if span > 0 else None,
        'n_modules': len(pairs),
    }


if __name__ == '__main__':
    import sys
    trace = sys.argv[1] if len(sys.argv) > 1 else 'bench_profile'
    ts = device_step_times_ms(trace)
    print(f'{len(ts)} module executions; ms each: '
          f'{[round(t, 3) for t in sorted(ts)[-10:]]}')
    print('duty:', duty_cycle_summary(trace))
    stalls = stall_gaps_ms(trace)
    if stalls:
        print(f"stalls: span {stalls['span_ms']} ms, sync "
              f"{stalls['sync_ms']} ms, gaps {stalls['gap_ms']} ms "
              f"({stalls['n_gaps']})")
        for gap_ms, at_ms, cover in stalls['gaps'][:8]:
            print(f'  {gap_ms:6.3f} ms at +{at_ms:8.3f} ms  {cover[:4]}')
    print('top ops (total ms, count):')
    for name, (ms, count) in op_breakdown_ms(trace, top=40).items():
        print(f'  {ms:9.3f}  x{count:<5d} {name}')
