"""Long-audio chunked inference: split batches into overlapping segments
and stitch per-clip score arrays back together.

Capability parity with ``pb_sed/utils/segment.py:7-71``: segments are
tagged ``<id>_!segment!_<i>_<n>``; ``merge_segments`` trims half the
overlap from interior edges before concatenating along time.

Works on the waveform-input batches of this framework (key 'audio_data',
sample domain) as well as on precomputed 'stft' batches (frame domain).
"""
from math import ceil

import numpy as np


def segment_batch(batch, max_length, overlap, keys=None, stft=None):
    """Split a batch along time into overlapping segments.

    Args:
        batch: collated batch dict.
        max_length: maximum segment length in FRAMES.
        overlap: overlap between segments in FRAMES.
        keys: keys to segment; defaults to ('audio_data',) or ('stft',).
        stft: STFT geometry (required for waveform batches to convert the
            frame-domain max_length/overlap to samples).

    Returns: list of segment batches.
    """
    seq_lens = np.asarray(batch['seq_len'])
    if seq_lens.max() <= max_length:
        return [batch]
    if keys is None:
        keys = ('audio_data',) if 'audio_data' in batch else ('stft',)
    shift = max_length - overlap
    n_segments = int(ceil((seq_lens.max() - max_length) / shift) + 1)
    print(f'Split batch with sequence length {seq_lens.max()} into '
          f'{n_segments} segments.')
    segments = []
    for i in range(n_segments):
        start_frame = i * shift
        seg = {}
        for key, value in batch.items():
            if key in keys:
                if key == 'audio_data':
                    assert stft is not None, 'need STFT geometry'
                    start = start_frame * stft.shift
                    length = stft.num_samples_for_frames(max_length)
                    seg[key] = _slice_pad(value, start, length)
                else:
                    seg[key] = _slice_pad(value, start_frame, max_length,
                                          axis=1)
            elif key == 'example_id':
                seg[key] = [
                    f'{ex_id}_!segment!_{i}_{n_segments}'
                    for ex_id in value]
            elif key == 'seq_len':
                seg[key] = np.asarray([
                    int(np.clip(sl - start_frame, 0, max_length))
                    for sl in seq_lens], dtype=np.int32)
            elif key == 'seq_len_samples':
                if stft is None:
                    seg[key] = value
                else:
                    start = start_frame * stft.shift
                    length = stft.num_samples_for_frames(max_length)
                    seg[key] = np.asarray([
                        int(np.clip(s - start, 0, length))
                        for s in np.asarray(value)], dtype=np.int32)
            elif key.endswith('_targets') and np.ndim(value) == 3:
                seg[key] = _slice_pad(value, start_frame, max_length,
                                      axis=-1)
            else:
                seg[key] = value
        segments.append(seg)
    return segments


def _slice_pad(arr, start, length, axis=-1):
    arr = np.asarray(arr)
    axis = axis % arr.ndim
    stop = min(start + length, arr.shape[axis])
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(start, stop)
    out = arr[tuple(sl)]
    pad = length - out.shape[axis]
    if pad > 0:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        out = np.pad(out, widths)
    return out


def merge_segments(segmental_output, segment_overlap):
    """{segment_id: (..., T, K) score arr} -> {clip_id: merged arr}.

    Interior edges lose ceil(overlap/2) frames on the left segment and
    overlap//2 frames on the right segment.
    """
    merged = {}
    for audio_id in sorted(segmental_output.keys()):
        if '_!segment!_0_' in audio_id:
            clip_id, n_segments = audio_id.split('_!segment!_0_')
            n_segments = int(n_segments)
            parts = []
            for i in range(n_segments):
                arr = segmental_output[
                    f'{clip_id}_!segment!_{i}_{n_segments}']
                if i < n_segments - 1 and segment_overlap > 0:
                    arr = arr[..., :-ceil(segment_overlap / 2), :]
                if i > 0 and segment_overlap > 0:
                    arr = arr[..., segment_overlap // 2:, :]
                parts.append(arr)
            merged[clip_id] = np.concatenate(parts, axis=-2)
        elif '_!segment!_' not in audio_id:
            merged[audio_id] = segmental_output[audio_id]
    return merged
