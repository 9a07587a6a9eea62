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


def test_synthetic21_rearrangement(tmp_path):
    """stdlib rearrangement of the unpacked dcase_synth archive matches
    the reference layout contract (desed/download.py:137-157)."""
    from pb_sed_tpu.database.desed.download import rearrange_synthetic21
    db = tmp_path / 'desed'
    archive = db / 'synthetic' / 'dcase_synth'
    for purpose in ('train', 'validation'):
        scapes = (archive / 'audio' / purpose
                  / f'synthetic21_{purpose}' / 'soundscapes')
        scapes.mkdir(parents=True)
        (scapes / 'clip0.wav').write_bytes(b'RIFF')
        (scapes / 'clip0.jams').write_text('{}')
        (scapes / 'notes.txt').write_text('x')
        meta = (archive / 'metadata' / purpose
                / f'synthetic21_{purpose}')
        meta.mkdir(parents=True)
        (meta / 'soundscapes.tsv').write_text(
            'filename\tonset\toffset\tevent_label\n')
    done = rearrange_synthetic21(db, archive)
    assert done == ['train', 'validation']
    for purpose in ('train', 'validation'):
        target = db / 'audio' / purpose / 'synthetic21'
        assert (target / 'clip0.wav').exists()
        assert not list(target.glob('*.jams'))
        assert not list(target.glob('*.txt'))
        assert (db / 'metadata' / purpose / 'synthetic21.tsv').exists()
    # idempotent: a second run reports done without touching anything
    assert rearrange_synthetic21(db, archive) == ['train', 'validation']


def test_segments_from_desed_strong_tsv(tmp_path):
    from pb_sed_tpu.database.audioset.download import (
        download_clips_from_tsv, segments_from_desed_strong_tsv)
    tsv = tmp_path / 'strong.tsv'
    tsv.write_text(
        'filename\tonset\toffset\tevent_label\n'
        'Yabc123_30.000_40.000.wav\t0.1\t2.0\tDog\n'
        'Yabc123_30.000_40.000.wav\t3.0\t4.0\tCat\n'   # same clip
        'Yd_ef-4_5.000_15.000.wav\t1.0\t2.0\tDog\n'    # _ in ytid
    )
    segments = segments_from_desed_strong_tsv(tsv)
    assert len(segments) == 2
    assert segments[0] == ('Yabc123_30.000_40.000', 'abc123', 30., 40.)
    assert segments[1] == ('Yd_ef-4_5.000_15.000', 'd_ef-4', 5., 15.)

    # failed clips land in the missing-files manifest
    from unittest import mock
    from pb_sed_tpu.database.audioset import download as dl

    with mock.patch.object(
            dl, 'download_clip', lambda *a, **k: False):
        failed = download_clips_from_tsv(
            tsv, tmp_path / 'audio', num_workers=2,
            missing_files_tsv=tmp_path / 'missing' / 'strong.tsv')
    assert len(failed) == 2
    manifest = (tmp_path / 'missing' / 'strong.tsv').read_text()
    assert 'Yabc123_30.000_40.000.wav' in manifest
