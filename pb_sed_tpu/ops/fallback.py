"""One-time surfacing of silent kernel fallbacks.

When ``use_pallas=True`` resolves to the plain XLA path anyway (hidden
size above the kernels' VMEM gate, a conv-tower config the packed plan
declines, ...) the run silently trains several times slower — an
operator trap (round-3 review). Every such decision is recorded here and
warned about ONCE per (site, reason); ``bench.py`` exports the records
so the perf JSON shows which kernels actually engaged.

The expected off-TPU fallback (``use_pallas=True`` on a CPU backend,
e.g. the test mesh) is NOT reported — it is documented behavior
(``ops/rnn.py:_pallas_enabled``), not a surprise.
"""
import warnings

_warned = set()
_records = []


def note_fallback(site, reason):
    """Record (and warn once about) a Pallas->XLA fallback decision."""
    key = (str(site), str(reason))
    if key not in _records:
        _records.append(key)
    if key in _warned:
        return
    _warned.add(key)
    warnings.warn(
        f'use_pallas=True requested but {site} falls back to the XLA '
        f'path: {reason}. The run still computes the same values, just '
        f'without the hand-written TPU kernels (typically several times '
        f'slower).', RuntimeWarning, stacklevel=3)


def fallback_records():
    """All distinct (site, reason) fallbacks seen this process."""
    return list(_records)


def reset():
    """Test hook: clear the once-only state."""
    _warned.clear()
    _records.clear()
