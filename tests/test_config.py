"""Tests for the dogmatic config system (behavioral contract from
padertorch Configurable as used by the reference, SURVEY.md §2.3a)."""
import pytest

from pb_sed_tpu.utils.config import (
    Configurable, DogmaticConfig, instantiate, config_to_json, import_class,
)


class Inner(Configurable):
    def __init__(self, width=4, depth=2):
        self.width = width
        self.depth = depth


class Outer(Configurable):
    def __init__(self, inner, scale=1.0, name='outer'):
        self.inner = inner
        self.scale = scale
        self.name = name

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['inner'] = {'factory': Inner}
        # cross-reference into the sub-config (on-demand default fill)
        config['scale'] = float(config['inner']['width'])


class Mirror(Configurable):
    def __init__(self, fwd, bwd):
        self.fwd = fwd
        self.bwd = bwd

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['fwd'] = {'factory': Inner}
        config['bwd'] = {}
        config['bwd'].update(config['fwd'].to_dict(), reverse=True)


def test_signature_defaults():
    cfg = Inner.get_config()
    assert cfg == {'factory': Inner, 'width': 4, 'depth': 2}


def test_user_updates_are_dogmatic():
    cfg = Outer.get_config({'inner': {'width': 8}})
    assert cfg['inner']['width'] == 8
    assert cfg['inner']['depth'] == 2  # default still filled
    assert cfg['scale'] == 8.0  # finalize saw the dogmatic value


def test_defaults_do_not_overwrite_dogma():
    cfg = Outer.get_config({'scale': 3.5})
    assert cfg['scale'] == 3.5


def test_nested_factory_instantiation():
    cfg = Outer.get_config({'inner': {'width': 16}})
    obj = Outer.from_config(cfg)
    assert isinstance(obj, Outer)
    assert isinstance(obj.inner, Inner)
    assert obj.inner.width == 16
    assert obj.scale == 16.0


def test_reverse_update_mirrors_config():
    cfg = Mirror.get_config({'fwd': {'width': 32}})
    assert cfg['bwd']['width'] == 32
    assert cfg['bwd']['factory'] == Inner
    # dogmatic value in bwd survives the mirror
    cfg2 = Mirror.get_config({'fwd': {'width': 32}, 'bwd': {'width': 64}})
    assert cfg2['bwd']['width'] == 64


def test_get_config_mutates_caller_dict():
    updates = {'inner': {'width': 8}}
    Outer.get_config(updates)
    assert updates['scale'] == 8.0
    assert updates['factory'] == Outer


def test_json_roundtrip():
    cfg = Outer.get_config()
    js = config_to_json(cfg)
    assert isinstance(js['factory'], str)
    obj = instantiate(js)
    assert isinstance(obj, Outer)
    assert import_class(js['factory']) is Outer


def test_dogmatic_mapping_interface():
    cfg = DogmaticConfig.from_updates({'a': 1, 'b': {'c': 2}})
    cfg['a'] = 99  # default write is ignored, 'a' is dogmatic
    assert cfg['a'] == 1
    cfg['b'] = {'c': 99, 'd': 3}  # merge: c dogmatic, d new default
    assert cfg['b']['c'] == 2
    assert cfg['b']['d'] == 3
    assert set(cfg) == {'a', 'b'}


def test_nested_utils():
    from pb_sed_tpu.utils.nested import flatten, deflatten
    d = {'a': {'b': 1, 'c': {'d': 2}}, 'e': 3}
    assert deflatten(flatten(d)) == d
    assert deflatten({'a.b.c': 1}, maxdepth=1) == {'a': {'b.c': 1}}


def test_samplers():
    import numpy as np
    from pb_sed_tpu.utils.random import (
        Uniform, LogTruncatedNormal, TruncatedExponential)
    rng = np.random.RandomState(0)
    u = Uniform(low=2., high=3., rng=rng)
    x = u(1000)
    assert (x >= 2).all() and (x <= 3).all()
    ltn = LogTruncatedNormal(scale=.08, truncation=np.log(1.3), rng=rng)
    y = ltn(1000)
    assert (y >= 1 / 1.3 - 1e-9).all() and (y <= 1.3 + 1e-9).all()
    te = TruncatedExponential(scale=.5, truncation=5., rng=rng)
    z = te(1000)
    assert (z >= 0).all() and (z <= 5 + 1e-9).all()
