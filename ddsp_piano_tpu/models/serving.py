"""One-jit serving graph: raw pianoroll -> audio entirely on device.

The reference's inference path runs MIDI voice allocation on the host
(numpy loop) before the model forward. With the vectorized allocator
(data.midi_encoders_jax) the whole chain — 88-key pianoroll -> polyphonic
conditioning -> control networks -> synthesis -> reverb — compiles into a
single XLA program, removing the host preprocessing round trip from the
serving critical path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.data.midi_encoders_jax import roll_to_conditioning_jax


def make_serving_fn(model, params, seed: int = 0):
    """Build a jitted (roll, pedal, piano_model) -> audio function.

    Args:
        model: a PianoModel (vectorized processor group).
        params: its parameters.
    Returns:
        fn(roll (b, T, 88, 2), pedal (b, T, 4), piano_model (b, 1) int32)
        -> audio (b, T * sample_rate / frame_rate).
    """
    n_synths = model.n_synths
    rng = jax.random.PRNGKey(seed)

    # Params are a jit *argument*, not a closure capture: baking weights in
    # as constants would bloat the compiled executable and force a full
    # recompile on every checkpoint refresh.
    @jax.jit
    def serve(params, roll: jax.Array, pedal: jax.Array,
              piano_model: jax.Array) -> jax.Array:
        # Binarize the active channel: the on-device allocator is
        # bit-identical to the host allocator for 0/1 rolls (including
        # over-capacity polyphony, property-tested), but non-binary active
        # values can collide into duplicate pitches where the two paths
        # legitimately diverge (midi_encoders_jax.py module docstring).
        roll = jnp.stack([(roll[..., 0] > 0).astype(roll.dtype),
                          roll[..., 1]], axis=-1)
        # vmap over the batch: conditioning comes out (b, T, n_synths, 2).
        conditioning, _ = jax.vmap(
            lambda r: roll_to_conditioning_jax(r, n_synths))(roll)
        features = {
            'conditioning': conditioning,
            'pedal': pedal,
            'piano_model': piano_model,
        }
        outs = model(params, features, rng=rng)
        return outs['audio_synth']

    def serve_bound(roll, pedal, piano_model, params=params):
        """Serve with the given (or default) params; donate nothing."""
        return serve(params, roll, pedal, piano_model)

    return serve_bound
