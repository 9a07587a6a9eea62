"""Minimal XSpace (.xplane.pb) reader: per-step DEVICE time from a JAX
profiler trace, without tensorflow/tensorboard_plugin_profile.

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
immune to dispatch/tunnel latency (PERFORMANCE.md throttle evidence).
Best-effort: returns [] when the schema doesn't match.
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


def device_step_times_ms(trace_dir):
    """Per-step device times (ms) from every .xplane.pb under trace_dir."""
    times = []
    for path in Path(trace_dir).rglob('*.xplane.pb'):
        buf = path.read_bytes()
        for field, wire, plane in iter_fields(buf):
            if field != 1 or wire != 2:
                continue
            name = b''
            lines = []
            for f2, w2, v2 in iter_fields(plane):
                if f2 == 2 and w2 == 2:
                    name = v2
                elif f2 == 3 and w2 == 2:
                    lines.append(v2)
            if b'TPU' not in name and b'tpu' not in name:
                continue
            for line in lines:
                line_name = b''
                events = []
                for f3, w3, v3 in iter_fields(line):
                    if f3 == 2 and w3 == 2:
                        line_name = v3
                    elif f3 == 4 and w3 == 2:
                        events.append(v3)
                if b'XLA Modules' not in line_name:
                    continue
                for event in events:
                    for f4, w4, v4 in iter_fields(event):
                        if f4 == 3 and w4 == 0:
                            times.append(v4 / 1e9)  # ps -> ms
    return times


if __name__ == '__main__':
    import sys
    ts = device_step_times_ms(sys.argv[1] if len(sys.argv) > 1
                              else 'bench_profile')
    print(f'{len(ts)} module executions; ms each: '
          f'{[round(t, 3) for t in sorted(ts)[-10:]]}')
