"""DataProvider: the single host-side data API.

Capability parity with ``pb_sed/data_preparation/provider.py:22-378``:
``get_train_set()`` / ``get_validate_set()`` / ``get_dataset(name)`` /
``get_raw(name)`` over a JsonDatabase; pipeline raw json -> filters
(labelless / too-short / excluded ids) -> audio load (+ eager cache) ->
per-dataset repeats + reshuffle + proportional interleave -> per-class
rebalancing (min examples per class per epoch) -> scale augmentation +
mixture augmentation -> (segmentation) -> Transform -> DataFetcher.

The dogmatic defaults mirror the reference's
(``provider.py:302-378``): 16 kHz max-normalized mono audio, STFT
shift 320 / win 960 / size 1024 'half' fading, events label encoder,
U(0.4,0.6)/U(-0.1,0.1) time-warp anchors, LogTruncatedNormal(ln 3) scale
augmentation, SuperposeEvents mixing with full overlap and window-length
fades.
"""
import dataclasses
import math
from collections import defaultdict
from typing import Callable

import numpy as np

from pb_sed_tpu.data import lazy
from pb_sed_tpu.data.audio import AudioReader
from pb_sed_tpu.data.encoder import MultiHotAlignmentEncoder
from pb_sed_tpu.data.fetcher import DataFetcher
from pb_sed_tpu.data.lazy import JsonDatabase
from pb_sed_tpu.data.mix import MixtureDataset, SuperposeEvents
from pb_sed_tpu.data.transform import Transform
from pb_sed_tpu.ops.stft import STFT
from pb_sed_tpu.utils.config import Configurable
from pb_sed_tpu.utils.misc import to_list
from pb_sed_tpu.utils.random import LogTruncatedNormal, Uniform


@dataclasses.dataclass
class DataProvider(Configurable):
    json_path: str = None
    audio_reader: Callable = None
    train_set: dict = None
    validate_set: str = None
    cached_datasets: list = None
    min_audio_length: float = 1.
    train_segmenter: Callable = None
    test_segmenter: Callable = None
    train_transform: Callable = None
    test_transform: Callable = None
    train_fetcher: Callable = None
    test_fetcher: Callable = None
    label_key: str = 'events'
    discard_labelless_train_examples: bool = True
    storage_dir: str = None
    # augmentation
    min_class_examples_per_epoch: float = 0
    scale_sampling_fn: Callable = None
    mix_interval: float = 1.5
    mix_fn: Callable = None

    def __post_init__(self):
        assert self.json_path is not None
        self.db = JsonDatabase(json_path=self.json_path)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def get_train_set(self, filter_example_ids=None):
        return self.get_dataset(self.train_set, train=True,
                                filter_example_ids=filter_example_ids)

    def get_validate_set(self, filter_example_ids=None):
        if self.validate_set is None:
            return None
        return self.get_dataset(self.validate_set, train=False,
                                filter_example_ids=filter_example_ids)

    def get_dataset(self, names_or_datasets, train=False,
                    filter_example_ids=None):
        ds = self.prepare_audio(names_or_datasets, train=train,
                                filter_example_ids=filter_example_ids)
        return self.segment_transform_and_fetch(ds, train=train)

    # ------------------------------------------------------------------
    # audio preparation
    # ------------------------------------------------------------------
    def prepare_audio(self, names_or_datasets, train=False,
                      filter_example_ids=None):
        loaded = self._load_audio(names_or_datasets, train=train,
                                  filter_example_ids=filter_example_ids)
        if not isinstance(loaded, list):
            loaded = [(loaded, 1)]
        dataset = self._tile_and_intersperse(loaded, shuffle=train)
        if train and self.min_class_examples_per_epoch:
            raw = self.get_raw(
                names_or_datasets,
                discard_labelless_examples=(
                    self.discard_labelless_train_examples),
                filter_example_ids=filter_example_ids)
            if not isinstance(raw, list):
                raw = [(raw, 1)]
            label_counts, labels = self._count_labels(raw, self.label_key)
            label_reps = self._compute_label_repetitions(
                label_counts, min_counts=self.min_class_examples_per_epoch)
            groups = self._build_repetition_groups(
                loaded, labels, label_reps)
            dataset = self._tile_and_intersperse(groups, shuffle=train)
        if train:
            dataset = self.scale_and_mix(dataset, dataset)
        print('Total data set length:', len(dataset))
        return dataset

    def _load_audio(self, names_or_datasets, train=False,
                    filter_example_ids=None, idx=None):
        if isinstance(names_or_datasets, (dict, list, tuple)):
            items = (list(names_or_datasets.items())
                     if isinstance(names_or_datasets, dict)
                     else [x if isinstance(x, (list, tuple)) else (x, 1)
                           for x in names_or_datasets])
            out = []
            for i, (name_or_ds, reps) in enumerate(items):
                if reps == 0:
                    continue
                out.append((
                    self._load_audio(
                        name_or_ds, train=train,
                        filter_example_ids=filter_example_ids, idx=i),
                    reps,
                ))
            return out
        ds = self.get_raw(
            names_or_datasets,
            discard_labelless_examples=(
                train and self.discard_labelless_train_examples),
            filter_example_ids=filter_example_ids,
        ).map(self.audio_reader)
        if (self.cached_datasets is not None
                and isinstance(names_or_datasets, str)
                and names_or_datasets in self.cached_datasets):
            ds = ds.cache(lazy=False)
        name = f' {names_or_datasets}' if isinstance(
            names_or_datasets, str) else ''
        print(f'Single data set length{name}:', len(ds))
        return ds

    def get_raw(self, names_or_datasets, discard_labelless_examples=False,
                filter_example_ids=None):
        if isinstance(names_or_datasets, (dict, list, tuple)):
            items = (list(names_or_datasets.items())
                     if isinstance(names_or_datasets, dict)
                     else [x if isinstance(x, (list, tuple)) else (x, 1)
                           for x in names_or_datasets])
            items = [x for x in items if x[1] > 0]
            return [
                (self.get_raw(
                    name_or_ds,
                    discard_labelless_examples=discard_labelless_examples,
                    filter_example_ids=filter_example_ids), reps)
                for name_or_ds, reps in items
            ]
        if isinstance(names_or_datasets, str):
            ds = self.db.get_dataset(names_or_datasets)
        else:
            ds = names_or_datasets
        if discard_labelless_examples:
            ds = ds.filter(
                lambda ex: self.label_key in ex and ex[self.label_key],
                lazy=False)
        if filter_example_ids is not None:
            ds = ds.filter(
                lambda ex: ex['example_id'] not in filter_example_ids,
                lazy=False)
        return ds.filter(
            lambda ex: ('audio_length' in ex
                        and ex['audio_length'] > self.min_audio_length),
            lazy=False)

    @staticmethod
    def _tile_and_intersperse(datasets, shuffle=False):
        if shuffle:
            datasets = [(ds.shuffle(reshuffle=True), reps)
                        for ds, reps in datasets]
        return lazy.intersperse(*[ds.tile(reps) for ds, reps in datasets])

    def scale_and_mix(self, dataset, mixin_dataset=None):
        if mixin_dataset is None:
            mixin_dataset = dataset
        if self.scale_sampling_fn is not None:
            scale_fn = self.scale_sampling_fn

            def scale(example):
                example = dict(example)
                example['audio_data'] = example['audio_data'] * float(
                    scale_fn())
                return example

            dataset = dataset.map(scale)
            mixin_dataset = mixin_dataset.map(scale)
        if self.mix_interval is not None:
            assert self.mix_fn is not None
            dataset = MixtureDataset(
                dataset, mixin_dataset, mix_interval=self.mix_interval,
                mix_fn=self.mix_fn)
        return dataset

    # ------------------------------------------------------------------
    # label rebalancing (reference provider.py:217-279)
    # ------------------------------------------------------------------
    def _count_labels(self, raw_datasets, label_key, label_counts=None,
                      reps=1):
        if label_counts is None:
            label_counts = defaultdict(int)
        if isinstance(raw_datasets, list):
            labels = []
            for ds, ds_reps in raw_datasets:
                label_counts, cur = self._count_labels(
                    ds, label_key, label_counts, reps=ds_reps * reps)
                labels.append(cur)
            return label_counts, labels
        labels = []
        for example in raw_datasets:
            cur = sorted(set(to_list(example.get(label_key, []))))
            labels.append(cur)
            for label in cur:
                label_counts[label] += reps
        return label_counts, labels

    @staticmethod
    def _compute_label_repetitions(label_counts, min_counts):
        max_count = max(label_counts.values())
        if isinstance(min_counts, float):
            assert 0. < min_counts < 1., min_counts
            min_counts = math.ceil(max_count * min_counts)
        assert isinstance(min_counts, int) and min_counts > 1, min_counts
        assert min_counts - 1 <= 0.9 * max_count, (min_counts, max_count)
        base_rep = int(1 // (1 - (min_counts - 1) / max_count))
        min_counts *= base_rep
        return {
            label: math.ceil(min_counts / count)
            for label, count in label_counts.items()
        }

    def _build_repetition_groups(self, dataset, labels, label_repetitions):
        assert len(dataset) == len(labels), (len(dataset), len(labels))
        if isinstance(dataset, list):
            return [
                (group_ds, ds_reps * group_reps)
                for (ds, ds_reps), cur_labels in zip(dataset, labels)
                for group_ds, group_reps in self._build_repetition_groups(
                    ds, cur_labels, label_repetitions)
            ]
        idx_reps = [
            max([label_repetitions[lb] for lb in idx_labels], default=1)
            for idx_labels in labels
        ]
        groups = defaultdict(list)
        for i, n_reps in enumerate(idx_reps):
            groups[n_reps].append(i)
        return [
            (dataset[sorted(indices)], n_reps)
            for n_reps, indices in sorted(groups.items())
        ]

    # ------------------------------------------------------------------
    def segment_transform_and_fetch(self, dataset, segment=True,
                                    transform=True, fetch=True,
                                    train=False):
        segmenter = self.train_segmenter if train else self.test_segmenter
        segment = segment and segmenter is not None
        if segment:
            dataset = dataset.map(segmenter)
        if transform:
            transform_fn = (self.train_transform if train
                            else self.test_transform)
            assert transform_fn is not None
            if segment:
                dataset = dataset.batch_map(transform_fn)
            else:
                dataset = dataset.map(transform_fn)
        if fetch:
            fetcher = self.train_fetcher if train else self.test_fetcher
            assert fetcher is not None
            dataset = fetcher(dataset, batched_input=segment)
        return dataset

    # ------------------------------------------------------------------
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['audio_reader'] = {
            'factory': AudioReader,
            'source_sample_rate': None,
            'target_sample_rate': 16000,
            'average_channels': True,
            'normalization_domain': 'instance',
            'normalization_type': 'max',
            'alignment_keys': ['events'],
        }
        config['train_transform'] = {
            'factory': Transform,
            'stft': {
                'factory': STFT,
                'shift': 320,
                'window_length': 960,
                'size': 1024,
                'fading': 'half',
                'pad': True,
            },
            'label_encoder': {
                'factory': MultiHotAlignmentEncoder,
                'label_key': 'events',
                'storage_dir': config['storage_dir'],
            },
            'anchor_sampling_fn': {
                'factory': Uniform, 'low': 0.4, 'high': 0.6,
            },
            'anchor_shift_sampling_fn': {
                'factory': Uniform, 'low': -0.1, 'high': 0.1,
            },
        }
        config['test_transform'] = {
            'factory': Transform,
            'stft': config['train_transform']['stft'].to_dict(),
            'label_encoder':
                config['train_transform']['label_encoder'].to_dict(),
            'provide_boundary_targets':
                config['train_transform']['provide_boundary_targets'],
            'provide_strong_targets':
                config['train_transform']['provide_strong_targets'],
        }
        config['train_fetcher'] = {
            'factory': DataFetcher,
            'prefetch_workers': 2,
            'batch_size': 16,
            'max_padding_rate': .05,
            'pad_to_multiple': 64,
            'max_bucket_buffer_size': 2000,
            'drop_incomplete': True,
            'global_shuffle': False,
            'stft': config['train_transform']['stft'].to_dict(),
        }
        config['test_fetcher'] = {
            'factory': DataFetcher,
            'prefetch_workers':
                config['train_fetcher']['prefetch_workers'],
            'batch_size': 2 * config['train_fetcher']['batch_size'],
            'max_padding_rate': config['train_fetcher']['max_padding_rate'],
            'pad_to_multiple': config['train_fetcher']['pad_to_multiple'],
            'bucket_expiration':
                config['train_fetcher']['bucket_expiration'],
            'max_bucket_buffer_size':
                config['train_fetcher']['max_bucket_buffer_size'],
            'drop_incomplete': False,
            'global_shuffle': False,
            'stft': config['train_transform']['stft'].to_dict(),
        }
        config['scale_sampling_fn'] = {
            'factory': LogTruncatedNormal,
            'loc': 0.,
            'scale': 1.,
            'truncation': float(np.log(3.)),
        }
        if config['mix_interval'] is not None:
            config['mix_fn'] = {
                'factory': SuperposeEvents,
                'min_overlap': 1.,
                'fade_length':
                    config['train_transform']['stft']['window_length'],
                'label_key': 'events',
            }
