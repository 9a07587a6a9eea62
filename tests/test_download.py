"""Downloader smoke tests without network: segment CSV parsing and the
queue-based multi-worker fetcher with per-clip failure tolerance
(reference database/audioset/download.py:42-144, desed/download.py)."""
from pathlib import Path
from unittest import mock


def test_read_segments(tmp_path):
    from pb_sed_tpu.database.audioset import download as dl
    csv_path = tmp_path / 'segments.csv'
    csv_path.write_text(
        '# Segments csv\n'
        '# num_ytids=2\n'
        'abc123, 10.000, 20.000, "/m/09x0r,/m/05zppz"\n'
        'def456, 0.000, 10.000, "/m/09x0r"\n'
    )
    segments = dl.read_segments(csv_path)
    assert len(segments) == 2
    clip_id, ytid, start, end = segments[0]
    assert ytid == 'abc123'
    assert (start, end) == (10., 20.)
    assert clip_id == 'Yabc123_10_20'


def test_download_clips_tolerates_failures(tmp_path):
    """Per-clip failures are collected, not raised (reference emits
    missing/damaged manifests instead of aborting)."""
    from pb_sed_tpu.database.audioset import download as dl
    segments = [(f'clip{i}', f'yt{i}', 0., 10.) for i in range(6)]

    def fake_download_clip(ytid, start, end, out_path, timeout=60,
                           **kwargs):
        ok = int(ytid[2:]) % 2 == 0
        if ok:
            Path(out_path).write_bytes(b'RIFF')
        return ok

    with mock.patch.object(dl, 'download_clip', fake_download_clip):
        failed = dl.download_clips(
            segments, tmp_path / 'audio', num_workers=3)
    assert sorted(failed) == ['clip1', 'clip3', 'clip5']
    assert sorted(p.name for p in (tmp_path / 'audio').glob('*.wav')) \
        == ['clip0.wav', 'clip2.wav', 'clip4.wav']


def test_desed_download_gates_on_missing_tools(tmp_path, capsys):
    """Without network/tooling the downloader reports what it would do
    and fails soft (no exception, no partial tree)."""
    from pb_sed_tpu.database.desed import download as dl
    try:
        dl.download(tmp_path / 'desed', n_jobs=1)
    except Exception as exc:  # noqa: BLE001 - must be a clean, typed error
        assert isinstance(exc, (RuntimeError, OSError)), exc
