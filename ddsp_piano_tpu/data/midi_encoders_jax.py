"""Vectorized JAX voice allocator: pianoroll -> conditioning inside jit.

The third implementation of the channel-assignment algorithm (numpy
semantic reference in midi_encoders.py, C++ host hot path in native/):
a lax.scan over frames with fixed-size (n_synths) state, so MIDI
preprocessing can run on-device as part of a jitted serving graph.

Exactness: bit-identical to the numpy reference for every binary
(0/1-active) pianoroll, INCLUDING frames whose polyphony exceeds the
capacity (property-tested over persistently over-capacity rolls,
tests/test_midi_data.py::TestJaxAllocatorOverCapacity). The reference's
round-robin-overflow quirk chain (assigner == -1 writing through index
-1, zero pitches becoming "new" when the table is full) is structurally
unreachable from binary rolls: the top-n window releases and admits
notes in balanced counts, so the post-release free slots always cover
the new notes. The overflow clamp below (excess new notes -> last
channel) therefore only fires for malformed inputs — non-binary active
values, whose key*active products can collide into duplicate pitches —
where this path diverges from the host allocator; the serving entry
point binarizes the active channel so such inputs cannot reach it.

Algorithm notes (derived from the sequential semantics):
- update_assigner walks cyclically to the next free slot, so consecutive
  assignments consume the free slots in ring order starting at the cursor;
  new notes take the first ranks of that ring, silent slots the rest.
- After a frame with z > 0 silent slots the cursor lands on the first
  silent-filled slot; with none it becomes -1 (full).
- When the cursor is -1 and the release pass frees channels, it restarts
  at the first channel released in scan order (the reference calls
  update_assigner inside the release loop at that moment).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_PITCH = 21
NUM_KEYS = 88


def _frame_step(n: int, state, frame):
    assigned, cursor, reorder, started = state
    pitches, velocity = frame                     # (n,), (n,) ascending
    idx = jnp.arange(n)

    # ---- fast path: unchanged note set -> reuse previous permutation ----
    eq = pitches[:, None] == assigned[None, :]    # (n_pitch, n_slot)
    mutual = jnp.all(eq.any(axis=1)) & jnp.all(eq.any(axis=0))
    fast = mutual & started

    # ---- slow path -------------------------------------------------------
    keep = eq.any(axis=0)                         # slot's note still active
    released = (assigned != 0) & ~keep
    assigned_rel = jnp.where(keep, assigned, 0.0)
    # Cursor reset when it was -1 and something got released: first
    # released channel in scan order.
    first_released = jnp.argmax(released)
    cursor_rel = jnp.where((cursor < 0) & released.any(),
                           first_released, cursor)

    reorder_new = jnp.zeros((n,), jnp.int32)
    # Sustained notes keep their channels: slot s <- c with
    # pitches[c] == assigned_rel[s] != 0.
    match = (assigned_rel[:, None] == pitches[None, :]) \
        & (pitches != 0)[None, :]                 # (slot, c)
    sustained_slot = match.any(axis=1)
    reorder_new = jnp.where(sustained_slot,
                            jnp.argmax(match, axis=1).astype(jnp.int32),
                            reorder_new)

    # Ring-ordered free slots from the cursor.
    free = assigned_rel == 0.0
    start = jnp.maximum(cursor_rel, 0)
    ring_pos = (idx - start) % n
    ring_pos = jnp.where(free, ring_pos, n + 1)   # occupied -> +inf-ish
    # rank[s] = position of slot s among free slots in ring order.
    rank = jnp.sum((ring_pos[None, :] < ring_pos[:, None]) & free[None, :],
                   axis=1)

    # New notes (ascending c) take ranks 0..m-1; silent entries the rest.
    # Membership is tested against the POST-release table (a freed slot
    # contributes a 0 entry, so silent pitches are not "new" when any slot
    # is free — matching the reference's loop ordering).
    is_new = ~(pitches[:, None] == assigned_rel[None, :]).any(axis=1)
    new_order = jnp.cumsum(is_new.astype(jnp.int32)) - 1   # rank per new c
    n_new = is_new.sum()
    is_zero = pitches == 0.0
    zero_order = jnp.cumsum((is_zero & ~is_new).astype(jnp.int32)) - 1 + n_new

    want_rank = jnp.where(is_new, new_order,
                          jnp.where(is_zero, zero_order, -1))
    n_free = free.sum()
    # c -> slot: the free slot whose ring rank equals want_rank[c]
    # (overflow: clamp everything beyond the free count to the last slot,
    # the documented simplification of the reference's -1 writes).
    slot_of_rank = jnp.argmax(
        (rank[None, :] == jnp.arange(n)[:, None]) & free[None, :], axis=1)
    target = jnp.where(want_rank < n_free,
                       slot_of_rank[jnp.clip(want_rank, 0, n - 1)],
                       n - 1).astype(jnp.int32)
    assign_mask = want_rank >= 0
    reorder_new = reorder_new.at[
        jnp.where(assign_mask, target, n)].set(
        idx.astype(jnp.int32), mode='drop')
    # Table update: new nonzero pitches occupy their slots.
    new_nonzero = is_new & ~is_zero
    assigned_new = assigned_rel.at[
        jnp.where(new_nonzero, target, n)].set(pitches, mode='drop')

    # Final cursor: first silent-filled slot in ring order, or -1 if full.
    z = (is_zero & assign_mask & (want_rank < n_free)).sum()
    first_zero_rank = n_new
    cursor_new = jnp.where(
        z > 0,
        slot_of_rank[jnp.clip(first_zero_rank, 0, n - 1)].astype(jnp.int32),
        jnp.asarray(-1, jnp.int32))

    # ---- select fast vs slow --------------------------------------------
    assigned_out = jnp.where(fast, assigned, assigned_new)
    cursor_out = jnp.where(fast, cursor, cursor_new)
    reorder_out = jnp.where(fast, reorder, reorder_new)

    out_pitch = pitches[reorder_out]
    out_vel = velocity[reorder_out]
    new_state = (assigned_out, cursor_out.astype(jnp.int32), reorder_out,
                 jnp.ones((), bool))
    return new_state, (out_pitch, out_vel)


def roll_to_conditioning_jax(roll: jax.Array, n_synths: int = 16
                             ) -> Tuple[jax.Array, jax.Array]:
    """jit-able voice allocation.

    Args:
        roll: (n_frames, 88, 2) active/onset-velocity pianoroll.
    Returns:
        conditioning (n_frames, n_synths, 2) float32,
        polyphony (n_frames,) float32.
    """
    roll = jnp.asarray(roll, jnp.float32)
    active = roll[..., 0]
    polyphony = active.sum(axis=-1)
    pitched = active * jnp.arange(MIN_PITCH, MIN_PITCH + NUM_KEYS,
                                  dtype=jnp.float32)
    # Stable ascending sort (ties keep key order, matching the numpy
    # reference's kind='stable').
    order = jnp.argsort(pitched, axis=-1, stable=True)[:, -n_synths:]
    pitches = jnp.take_along_axis(pitched, order, axis=-1)
    velocity = jnp.take_along_axis(roll[..., 1], order, axis=-1)

    n = n_synths
    init = (jnp.zeros((n,), jnp.float32), jnp.zeros((), jnp.int32),
            jnp.arange(n, dtype=jnp.int32), jnp.zeros((), bool))
    step = lambda s, f: _frame_step(n, s, f)
    _, (out_pitch, out_vel) = jax.lax.scan(step, init, (pitches, velocity))
    conditioning = jnp.stack([out_pitch, out_vel], axis=-1)
    return conditioning, polyphony
