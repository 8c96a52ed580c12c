"""gin-compat: parse the reference's shipped .gin configs and forward."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.configs import gin_compat
from ddsp_piano_tpu.data.pipeline import get_dummy_data

REF_CONFIG_DIR = '/root/reference/ddsp_piano/configs'
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                               reason="reference configs not mounted")

GIN_FILES = sorted(glob.glob(os.path.join(REF_CONFIG_DIR, '*.gin')))


def test_value_parser():
    p = gin_compat._ValueParser
    assert p("3").parse() == 3
    assert p("2.5").parse() == 2.5
    assert p("True").parse() is True
    assert p("'abc'").parse() == 'abc'
    assert p("[1, 2, 3]").parse() == [1, 2, 3]
    assert p("(('a', 1), ('b', 2))").parse() == (('a', 1), ('b', 2))
    m = p("%n_synths").parse()
    assert isinstance(m, gin_compat.MacroRef) and m.name == 'n_synths'
    r = p("@context_net/layers.GRU()").parse()
    assert r.selector == 'layers.GRU' and r.scope == 'context_net'
    assert r.called
    d = p("{'a': [1], 'b': %x}").parse()
    assert d['a'] == [1]


def test_parse_structure():
    cfg = gin_compat.parse_gin_string("""
import ddsp

n_synths = 16
sample_rate = 16000

Foo.param = 1
scope/Foo.param = 2
Bar:
    x = [1,
         2]
    y = %n_synths
""")
    assert cfg.macros['n_synths'] == 16
    assert cfg.get('Foo')['param'] == 1
    assert cfg.get('Foo', scope='scope')['param'] == 2
    assert cfg.get('Bar')['x'] == [1, 2]


@needs_ref
@pytest.mark.parametrize('gin_file', GIN_FILES,
                         ids=[os.path.basename(f) for f in GIN_FILES])
def test_reference_gin_builds_and_forwards(gin_file):
    model = gin_compat.build_from_gin(gin_file, duration=0.5)
    params = model.init(jax.random.PRNGKey(0))
    feats = get_dummy_data(batch_size=1, duration=0.5,
                           sample_rate=model.sample_rate)
    feats = {k: jnp.asarray(v) for k, v in feats.items()}
    outs = jax.jit(
        lambda p, f: model(p, f, training=True, rng=jax.random.PRNGKey(1)))(
            params, feats)
    assert outs['audio_synth'].shape == (1, int(model.sample_rate * 0.5))
    for k, v in outs['losses'].items():
        assert np.isfinite(float(v)), (os.path.basename(gin_file), k)


@needs_ref
def test_gin_dafx22_matches_python_config_structure():
    """The gin-built dafx22 has the same parameter tree as the Python one."""
    from ddsp_piano_tpu.configs import get_model
    gin_model = gin_compat.build_from_gin(
        os.path.join(REF_CONFIG_DIR, 'dafx22.gin'), duration=0.5)
    py_model = get_model('dafx22', duration=0.5)
    gp = gin_model.init(jax.random.PRNGKey(0))
    pp = py_model.init(jax.random.PRNGKey(0))
    gs = jax.tree.structure(gp)
    ps = jax.tree.structure(pp)
    assert gs == ps
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(pp)):
        assert a.shape == b.shape


@needs_ref
def test_gin_dafx22_forward_matches_python_config():
    """gin-built and Python-built dafx22 agree numerically with the same
    parameters and inputs."""
    from ddsp_piano_tpu.configs import get_model
    gin_model = gin_compat.build_from_gin(
        os.path.join(REF_CONFIG_DIR, 'dafx22.gin'), duration=0.5)
    py_model = get_model('dafx22', duration=0.5)
    params = py_model.init(jax.random.PRNGKey(0))
    feats = {k: jnp.asarray(v)
             for k, v in get_dummy_data(batch_size=1, duration=0.5,
                                        sample_rate=16000).items()}
    rng = jax.random.PRNGKey(5)
    a = jax.jit(lambda p, f: gin_model(p, f, rng=rng)['audio_synth'])(
        params, feats)
    b = jax.jit(lambda p, f: py_model(p, f, rng=rng)['audio_synth'])(
        params, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scope_precedence_longer_suffix_wins():
    """Gin precedence: a more specific (longer) matching scope suffix must
    override a shorter one, regardless of binding order."""
    from ddsp_piano_tpu.configs.gin_compat import GinConfig

    cfg = GinConfig(macros={}, bindings={
        'Dense': {'': {'units': 1},
                  'c': {'units': 64},
                  'b/c': {'units': 128}}})
    assert cfg.get('layers.Dense', scope='a/b/c')['units'] == 128
    assert cfg.get('layers.Dense', scope='x/c')['units'] == 64
    assert cfg.get('layers.Dense', scope='z')['units'] == 1
