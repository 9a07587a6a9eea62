"""Database layer tests: helper probing, create_json on the synthetic
corpus tree, providers' dogmatic wiring, resample_db."""
import numpy as np

from pb_sed_tpu.database.helper import prepare_sound_dataset
from pb_sed_tpu.database import resample_db as rdb

from tests.util_synth import SR, build_database, write_wav


def test_prepare_sound_dataset(tmp_path):
    write_wav(tmp_path / 'a.wav', np.zeros(SR // 2))
    dataset = {
        'a': {'audio_path': str(tmp_path / 'a.wav')},
        'b': {'audio_path': str(tmp_path / 'missing.wav')},
    }
    dataset, missing = prepare_sound_dataset(dataset)
    assert missing == {'b'}
    assert abs(dataset['a']['audio_length'] - 0.5) < 1e-6


def test_desed_create_json(tmp_path):
    # DESED-style corpus tree with metadata tsvs
    root = tmp_path / 'desed'
    import csv
    strong_rows = []
    weak_rows = []
    for i in range(3):
        p = root / 'audio' / 'train' / 'synthetic21' / f's{i}.wav'
        write_wav(p, np.random.RandomState(i).randn(SR) * 0.1)
        strong_rows.append((f's{i}.wav', 0.1, 0.4, 'Dog'))
    for i in range(2):
        p = root / 'audio' / 'train' / 'weak' / f'w{i}.wav'
        write_wav(p, np.random.RandomState(i).randn(SR) * 0.1)
        weak_rows.append((f'w{i}.wav', 'Dog,Cat'))
    p = root / 'audio' / 'train' / 'unlabel_in_domain' / 'u0.wav'
    write_wav(p, np.zeros(SR))
    meta = root / 'metadata' / 'train'
    meta.mkdir(parents=True)
    with (meta / 'synthetic21.tsv').open('w') as fid:
        fid.write('filename\tonset\toffset\tevent_label\n')
        for row in strong_rows:
            fid.write('\t'.join(map(str, row)) + '\n')
    with (meta / 'weak.tsv').open('w') as fid:
        fid.write('filename\tevent_labels\n')
        for name, labels in weak_rows:
            fid.write(f'{name}\t{labels}\n')

    from pb_sed_tpu.database.desed import create_json as cj
    db = cj.construct_json(root)
    assert 'train_synthetic21' in db['datasets']
    assert 'train_weak' in db['datasets']
    assert 'train_unlabel_in_domain' in db['datasets']
    ex = db['datasets']['train_synthetic21']['s0']
    assert ex['events'] == ['Dog']
    assert ex['events_start_times'] == [0.1]
    assert 'audio_length' in ex
    ex = db['datasets']['train_weak']['w0']
    assert set(ex['events']) == {'Dog', 'Cat'}
    ex = db['datasets']['train_unlabel_in_domain']['u0']
    assert 'events' not in ex


def test_audioset_ontology(tmp_path):
    import json
    ontology = [
        {'id': '/m/1', 'name': 'Animal', 'child_ids': ['/m/2']},
        {'id': '/m/2', 'name': 'Dog', 'child_ids': ['/m/3']},
        {'id': '/m/3', 'name': 'Bark', 'child_ids': []},
    ]
    path = tmp_path / 'ontology.json'
    path.write_text(json.dumps(ontology))
    from pb_sed_tpu.database.audioset.create_json import read_ontology
    onto, mid_to_name = read_ontology(path)
    assert onto['Bark']['ancestor_names'] == ['Animal', 'Dog']
    assert onto['Animal']['descendant_names'] == ['Bark', 'Dog']
    assert mid_to_name['/m/2'] == 'Dog'


def test_desed_provider_config(tmp_path):
    _, json_path = build_database(tmp_path)
    from pb_sed_tpu.database.desed.provider import DESEDProvider
    config = DESEDProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'train_weak': 2, 'train_strong': 1},
        'storage_dir': str(tmp_path),
        'train_fetcher': {'batch_size': 8},
    })
    assert config['validate_set'] == 'validation'
    assert config['train_fetcher'][
        'min_label_diversity_in_batch'] == 8
    provider = DESEDProvider.from_config(config)
    assert provider.db is not None


def test_audioset_provider_classes():
    from pb_sed_tpu.database.audioset.provider import AudioSetProvider
    assert AudioSetProvider.strongly_labeled_data(['train_strong'])
    assert not AudioSetProvider.strongly_labeled_data(
        ['balanced_train', 'eval'])


def test_resample_db(tmp_path):
    src = tmp_path / 'src'
    write_wav(src / 'x' / 'a.wav', np.zeros(SR), sr=SR)
    (src / 'meta.txt').write_text('hello')
    jobs = rdb.resample_db(src, tmp_path / 'dst', num_workers=1)
    assert (tmp_path / 'dst' / 'x' / 'a.wav').exists()
    assert (tmp_path / 'dst' / 'meta.txt').read_text() == 'hello'
    # dry run does not write
    jobs = rdb.resample_db(src, tmp_path / 'dst2', dry_run=True)
    assert not (tmp_path / 'dst2').exists() or not list(
        (tmp_path / 'dst2').iterdir())
