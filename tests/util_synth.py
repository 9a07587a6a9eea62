"""Synthetic DESED-style database fixture: sine-burst wavs + json
(SURVEY.md §7 "minimum end-to-end slice")."""
import wave
from pathlib import Path

import numpy as np

EVENT_CLASSES = ['beep', 'chirp', 'hum']
SR = 16000


def write_wav(path, audio, sr=SR):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pcm = np.clip(audio * 32767, -32768, 32767).astype('<i2')
    with wave.open(str(path), 'wb') as fid:
        fid.setnchannels(1)
        fid.setsampwidth(2)
        fid.setframerate(sr)
        fid.writeframes(pcm.tobytes())


def synth_event(kind, length, rng):
    t = np.arange(length) / SR
    if kind == 'beep':
        return 0.5 * np.sin(2 * np.pi * 1000 * t)
    if kind == 'chirp':
        return 0.5 * np.sin(2 * np.pi * (300 + 2000 * t / t[-1]) * t)
    return 0.4 * np.sin(2 * np.pi * 120 * t)


def build_database(root, num_train=12, num_weak=8, num_validate=6,
                   clip_seconds=0.5, seed=0):
    """Creates wavs + a DESED-style database dict with strong, weak and
    unlabeled datasets. Returns (db_dict, json_path)."""
    root = Path(root)
    rng = np.random.RandomState(seed)
    datasets = {}

    def make_clip(clip_id, dirname, labeled='strong'):
        length = int(clip_seconds * SR)
        audio = 0.01 * rng.randn(length)
        n_events = rng.randint(1, 3)
        # distinct classes per clip: repeated classes would leave soft
        # (0.5) gaps between events and exclude the clip from strong
        # metric buffers (reference soft-fill semantics)
        kinds = rng.choice(len(EVENT_CLASSES), n_events, replace=False)
        events, on, off = [], [], []
        for kind_idx in kinds:
            kind = EVENT_CLASSES[kind_idx]
            ev_len = rng.randint(length // 5, length // 2)
            start = rng.randint(0, length - ev_len)
            audio[start:start + ev_len] += synth_event(kind, ev_len, rng)
            events.append(kind)
            on.append(start / SR)
            off.append((start + ev_len) / SR)
        path = root / 'audio' / dirname / f'{clip_id}.wav'
        write_wav(path, audio)
        ex = {
            'audio_path': str(path),
            'audio_length': length / SR,
        }
        if labeled == 'strong':
            order = np.argsort(on)
            ex['events'] = [events[i] for i in order]
            ex['events_start_times'] = [round(on[i], 3) for i in order]
            ex['events_stop_times'] = [round(off[i], 3) for i in order]
        elif labeled == 'weak':
            ex['events'] = sorted(set(events))
        return ex

    datasets['train_strong'] = {
        f'strong_{i}': make_clip(f'strong_{i}', 'train_strong', 'strong')
        for i in range(num_train)}
    datasets['train_weak'] = {
        f'weak_{i}': make_clip(f'weak_{i}', 'train_weak', 'weak')
        for i in range(num_weak)}
    datasets['train_unlabel_in_domain'] = {
        f'unlabel_{i}': make_clip(f'unlabel_{i}', 'unlabel', 'none')
        for i in range(num_weak)}
    datasets['validation'] = {
        f'val_{i}': make_clip(f'val_{i}', 'validation', 'strong')
        for i in range(num_validate)}
    datasets['eval_public'] = {
        f'eval_{i}': make_clip(f'eval_{i}', 'eval_public', 'strong')
        for i in range(num_validate)}
    db = {'datasets': datasets}
    json_path = root / 'db.json'
    from pb_sed_tpu.utils.misc import dump_json
    dump_json(db, json_path)
    return db, json_path


def ground_truth_events(db, dataset_name):
    """{clip_id: [(onset, offset, label)]} for evaluation."""
    out = {}
    for clip_id, ex in db['datasets'][dataset_name].items():
        out[clip_id] = list(zip(
            ex['events_start_times'], ex['events_stop_times'],
            ex['events']))
    return out
