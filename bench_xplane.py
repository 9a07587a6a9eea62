"""Compatibility shim: the XSpace trace parser lives in
pb_sed_tpu.utils.xplane (used by bench.py and Trainer.profile_at)."""
from pb_sed_tpu.utils.xplane import (  # noqa: F401
    device_step_times_ms, dominant_module_span_ms, duty_cycle_summary,
    iter_fields, module_busy_times_ms, module_spans_by_name,
    op_breakdown_ms, stall_gaps_ms)

if __name__ == '__main__':
    import sys
    ts = device_step_times_ms(sys.argv[1] if len(sys.argv) > 1
                              else 'bench_profile')
    print(f'{len(ts)} module executions; ms each: '
          f'{[round(t, 3) for t in sorted(ts)[-10:]]}')
