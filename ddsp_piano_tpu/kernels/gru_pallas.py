"""Pallas TPU kernel for the GRU recurrence (control-path hot loop #2).

The reference's GRUs (/root/reference/ddsp_piano/modules/sub_modules.py:
498-524 via ddsp nn.Rnn) run 750-1000 sequential steps per forward; the
XLA lowering of ``lax.scan`` pays a per-iteration while-loop overhead
(buffer bookkeeping + loop condition) that dominates at the tiny
per-step matmul sizes here ((16, 192) @ (192, 192) — latency-, not
throughput-bound; BASELINE.md round-2 profile: ~1.6 ms of the 4.4 ms
forward is these scans).

This kernel runs the entire recurrence in ONE Pallas program:

- grid = (T / BT,) — TPU grid iterations execute sequentially on a core,
  so the hidden state lives in a VMEM scratch that persists across grid
  steps; each grid step streams one (BT, B, u) block of the precomputed
  input projections in and one hidden-state block out (double-buffered
  by the Pallas pipeline while the VPU/MXU works).
- the input projection x @ W_in + b_in for ALL timesteps stays OUTSIDE
  the kernel as one large MXU matmul (same hoisting as the lax.scan
  path, nn/layers.py GRU).
- the recurrent weights are pre-split into the three (u, u) gate blocks
  so every in-kernel slice is lane-aligned (u = 64/192 are multiples of
  the 8-sublane tile; a (B, 3u) fused matmul would need splits at
  192/384, which Mosaic relayouts).

Keras v2 reset_after numerics, bit-matching the scan path's step
(nn/layers.py:236-299):

    z = sig(xz + h Uz + bz);  r = sig(xr + h Ur + br)
    hh = tanh(xh + r * (h Uh + bh));  h' = z h + (1-z) hh

Precision caveat: "bit-matching" holds at like-for-like matmul precision
(verified in interpreter mode on CPU, where both paths are f32). On real
TPU the kernel's jnp.dot accumulates in f32 while the scan path's
jnp.matmul runs at XLA's DEFAULT TPU precision (bf16 multiplies), so the
two paths diverge at bf16-rounding scale per step; the measured
end-to-end effect on released weights is a 0.26 % spectral delta, both
paths sitting on the same ~3.6 % TPU-vs-CPU-f32 baseline (BASELINE.md
round 3). DDSP_PIANO_TPU_PALLAS_CTRL=0 is therefore a numerics knob only
up to that scale, not a bit-exact revert on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gru_kernel(xz_ref, xr_ref, xh_ref, wz_ref, wr_ref, wh_ref, b_ref,
                h0_ref, out_ref, h_ref, *, bt: int):
    """One (BT, B, u) time block; h_ref scratch carries the state."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = h0_ref[:]

    bz = b_ref[0]
    br = b_ref[1]
    bh = b_ref[2]

    def body(t, carry):
        h = h_ref[:]
        # Bias association matches the scan step (rec = h U + b_rec, THEN
        # + x) so the kernel is bit-compatible with nn/layers.py GRU.
        rz = jnp.dot(h, wz_ref[:],
                     preferred_element_type=jnp.float32) + bz
        rr = jnp.dot(h, wr_ref[:],
                     preferred_element_type=jnp.float32) + br
        rh = jnp.dot(h, wh_ref[:],
                     preferred_element_type=jnp.float32) + bh
        z = jax.nn.sigmoid(xz_ref[t] + rz)
        r = jax.nn.sigmoid(xr_ref[t] + rr)
        hh = jnp.tanh(xh_ref[t] + r * rh)
        h_new = z * h + (1.0 - z) * hh
        h_ref[:] = h_new
        out_ref[t] = h_new
        return carry

    jax.lax.fori_loop(0, bt, body, 0)


@functools.partial(jax.jit, static_argnums=(4,))
def gru_scan_pallas(x_proj: Array, rec_kernel: Array, rec_bias: Array,
                    h0: Array, interpret: bool = False) -> Array:
    """Run the GRU recurrence over precomputed input projections.

    Args:
        x_proj: (T, B, 3u) — x @ W_in + b_in for every step, gate order
            [z, r, h] on the last axis (the lax.scan path's layout).
        rec_kernel: (u, 3u) recurrent weights, same gate order.
        rec_bias: (3u,) recurrent bias.
        h0: (B, u) initial hidden state.
    Returns:
        (T, B, u) hidden states (float32), bit-compatible with the scan.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, three_u = x_proj.shape
    u = three_u // 3
    x_proj = x_proj.astype(jnp.float32)

    # Time block: bounded so 3 input + 1 output (BT, B, u) blocks fit VMEM
    # (~16 MB/core) with double buffering alongside the 3 (u, u) weights.
    bt = 64
    while bt > 8 and 8 * bt * b * u * 4 > 8 << 20:
        bt //= 2
    if 8 * bt * b * u * 4 > 8 << 20:
        # Even 8-step blocks blow the VMEM budget (very large folded
        # batch, e.g. b >= 512 at u = 192): Mosaic would fail allocation
        # at dispatch — take the lax.scan path instead.
        return gru_scan_reference(x_proj, rec_kernel, rec_bias, h0)

    # Pre-split gates so in-kernel tensors are (B, u) lane-aligned.
    xz, xr, xh = (x_proj[..., :u], x_proj[..., u:2 * u], x_proj[..., 2 * u:])
    wz, wr, wh = (rec_kernel[:, :u], rec_kernel[:, u:2 * u],
                  rec_kernel[:, 2 * u:])
    biases = jnp.stack([rec_bias[:u], rec_bias[u:2 * u], rec_bias[2 * u:]])
    t_pad = -(-t // bt) * bt
    if t_pad != t:
        pad = ((0, t_pad - t), (0, 0), (0, 0))
        xz, xr, xh = (jnp.pad(a, pad) for a in (xz, xr, xh))

    x_spec = pl.BlockSpec((bt, b, u), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((u, u), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((3, u), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    h0_spec = pl.BlockSpec((b, u), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_gru_kernel, bt=bt),
        grid=(t_pad // bt,),
        in_specs=[x_spec] * 3 + [w_spec] * 3 + [b_spec, h0_spec],
        out_specs=pl.BlockSpec((bt, b, u), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, u), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, u), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * b * u * 3 * u,
            bytes_accessed=4 * (4 * t_pad * b * u + 3 * u * u),
            transcendentals=3 * t_pad * b * u,
        ),
        interpret=interpret,
    )(xz, xr, xh, wz.astype(jnp.float32), wr.astype(jnp.float32),
      wh.astype(jnp.float32), biases.astype(jnp.float32),
      h0.astype(jnp.float32))
    return out[:t]


# -----------------------------------------------------------------------------
# Backward GRU kernel (training hot loop; round 4)
#
# Round-4 attribution (benchmarks/profile_train_bwd.py): the dafx22 train
# step's backward is dominated by the CONTROL path, not the oscillator —
# ctrl fwd+bwd 19.3 ms of the 34.4 ms value_and_grad, because jax.grad
# linearizes the lax.scan natively: 750 reverse-time iterations of tiny
# latency-bound matmuls plus residual traffic. This kernel runs the whole
# reverse recurrence in ONE Pallas program (grid steps walk time blocks
# BACKWARD; the carried dL/dh lives in VMEM scratch), recomputing the
# gates from (x_proj, h_{t-1}) instead of loading stored residuals — the
# forward's own hidden-state output is the only residual needed.
#
# The kernel stays PURELY batch-parallel: it emits the per-step gate
# gradients (dxz, dxr, dxh, drh) and dh0, and the cross-batch/cross-time
# WEIGHT gradients are formed outside as two bulk einsums —
#   dU* = einsum('tbi,tbj->ij', h_prev, d*) ,  db* = sum(d*)
# — which the MXU executes at full tilt and GSPMD all-reduces naturally
# when the batch is mesh-sharded (no collectives inside the kernel).
# -----------------------------------------------------------------------------


def _gru_bwd_kernel(xz_ref, xr_ref, xh_ref, hprev_ref, g_ref,
                    wz_ref, wr_ref, wh_ref, wzt_ref, wrt_ref, wht_ref,
                    b_ref, dxz_ref, dxr_ref, dxh_ref, drh_ref, dh0_ref,
                    dh_ref, *, bt: int):
    """One reverse time block: recompute gates, backprop dh through it.

    Index maps feed time block (G-1-i) at grid step i, so the program
    walks time backward; dh_ref scratch carries dL/dh_{t-1} across blocks.
    Zero-padded tail steps (t >= T) are processed first with g == 0 and
    dh == 0, which makes every gradient of theirs exactly zero.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    bz = b_ref[0]
    br = b_ref[1]
    bh = b_ref[2]

    def body(t_rev, carry):
        t = bt - 1 - t_rev
        h_prev = hprev_ref[t]
        # Recompute the forward gates (bit-identical to _gru_kernel).
        rz = jnp.dot(h_prev, wz_ref[:],
                     preferred_element_type=jnp.float32) + bz
        rr = jnp.dot(h_prev, wr_ref[:],
                     preferred_element_type=jnp.float32) + br
        rh = jnp.dot(h_prev, wh_ref[:],
                     preferred_element_type=jnp.float32) + bh
        z = jax.nn.sigmoid(xz_ref[t] + rz)
        r = jax.nn.sigmoid(xr_ref[t] + rr)
        hh = jnp.tanh(xh_ref[t] + r * rh)

        dh = dh_ref[:] + g_ref[t]
        dz = dh * (h_prev - hh)
        dpre = (dh * (1.0 - z)) * (1.0 - hh * hh)   # d(xh + r*rh)
        drh = dpre * r                               # d(h Uh + bh)
        dr_pre = (dpre * rh) * (r * (1.0 - r))       # d(xr + rr)
        dz_pre = dz * (z * (1.0 - z))                # d(xz + rz)
        dh_new = (dh * z
                  + jnp.dot(dz_pre, wzt_ref[:],
                            preferred_element_type=jnp.float32)
                  + jnp.dot(dr_pre, wrt_ref[:],
                            preferred_element_type=jnp.float32)
                  + jnp.dot(drh, wht_ref[:],
                            preferred_element_type=jnp.float32))
        dxz_ref[t] = dz_pre
        dxr_ref[t] = dr_pre
        dxh_ref[t] = dpre
        drh_ref[t] = drh
        dh_ref[:] = dh_new
        return carry

    jax.lax.fori_loop(0, bt, body, 0)
    dh0_ref[:] = dh_ref[:]


def _gru_reference_vjp(x_proj, rec_kernel, rec_bias, h0, g):
    """jax.vjp of the reference scan (fallback + parity oracle)."""
    _, pull = jax.vjp(
        lambda *a: gru_scan_reference(*a), x_proj, rec_kernel, rec_bias, h0)
    return pull(g)


def _gru_bwd_vmem_bt(b: int, u: int):
    """Time-block size for the bwd kernel, or None when even 8-step
    blocks blow VMEM (same escape hatch as the forward).

    Models the kernel's REAL footprint: 9 grid-streamed (bt, b, u)
    buffers (5 in + 4 out), each double-buffered by the Pallas pipeline,
    plus the 7 replicated (u, u)-ish weight blocks — against a 13 MB
    budget (16 MB/core minus headroom). Round-4 fix: the old formula
    (8 single-buffered streams vs 4 MB) rejected bt=8 at the dafx22
    TRAIN shapes (b=96, u=192 -> 4.7 MB), so the backward kernel
    silently never engaged in training and the first kernel-vs-scan
    train A/B measured the scan fallback against itself
    (BASELINE.md round-4 GRU-backward rows)."""
    bt = 64
    weights = 7 * u * u * 4
    while bt > 8 and 18 * bt * b * u * 4 + weights > 13 << 20:
        bt //= 2
    if 18 * bt * b * u * 4 + weights > 13 << 20:
        return None
    return bt


def _gru_bwd_streams(x_proj: Array, rec_kernel: Array, rec_bias: Array,
                     h0: Array, hs: Array, g: Array,
                     interpret: bool = False):
    """Batch-parallel part of the GRU VJP: per-step gate gradients.

    Returns (dxz, dxr, dxh, drh, dh0) with the (T, B, u) streams
    unpadded. No cross-batch reductions happen here — weight/bias grads
    are bulk einsums over these streams at the caller, so this unit is
    cleanly batch-shardable (see _gru_bwd_partitioned).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, three_u = x_proj.shape
    u = three_u // 3
    x_proj = x_proj.astype(jnp.float32)
    g = g.astype(jnp.float32)
    hs = hs.astype(jnp.float32)
    bt = _gru_bwd_vmem_bt(b, u)
    assert bt is not None, "caller must take the reference-VJP fallback"

    h_prev = jnp.concatenate([h0[jnp.newaxis].astype(jnp.float32),
                              hs[:-1]], axis=0)        # (T, B, u)
    xz, xr, xh = (x_proj[..., :u], x_proj[..., u:2 * u], x_proj[..., 2 * u:])
    wz, wr, wh = (rec_kernel[:, :u], rec_kernel[:, u:2 * u],
                  rec_kernel[:, 2 * u:])
    biases = jnp.stack([rec_bias[:u], rec_bias[u:2 * u], rec_bias[2 * u:]])
    t_pad = -(-t // bt) * bt
    h_prev_p = h_prev
    if t_pad != t:
        pad = ((0, t_pad - t), (0, 0), (0, 0))
        xz, xr, xh, h_prev_p, g = (jnp.pad(a, pad)
                                   for a in (xz, xr, xh, h_prev, g))

    nblocks = t_pad // bt
    rev = lambda i: (nblocks - 1 - i, 0, 0)
    x_spec = pl.BlockSpec((bt, b, u), rev, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((u, u), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((3, u), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    dh0_spec = pl.BlockSpec((b, u), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    dxz, dxr, dxh, drh, dh0 = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, bt=bt),
        grid=(nblocks,),
        in_specs=[x_spec] * 5 + [w_spec] * 6 + [b_spec],
        out_specs=[x_spec] * 4 + [dh0_spec],
        out_shape=[jax.ShapeDtypeStruct((t_pad, b, u), f32)] * 4
        + [jax.ShapeDtypeStruct((b, u), f32)],
        scratch_shapes=[pltpu.VMEM((b, u), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * b * u * 6 * u,
            bytes_accessed=4 * (9 * t_pad * b * u + 6 * u * u),
            transcendentals=3 * t_pad * b * u,
        ),
        interpret=interpret,
    )(xz, xr, xh, h_prev_p, g,
      wz.astype(f32), wr.astype(f32), wh.astype(f32),
      wz.T.astype(f32), wr.T.astype(f32), wh.T.astype(f32),
      biases.astype(f32))
    return dxz[:t], dxr[:t], dxh[:t], drh[:t], dh0


def _gru_grads_from_streams(rec_kernel, rec_bias, h0, hs, streams,
                            x_dtype=jnp.float32):
    """Assemble (dx_proj, d_rec_kernel, d_rec_bias, dh0) from the kernel's
    per-step streams: two bulk MXU einsums + sums (GSPMD inserts the
    cross-shard all-reduce when the batch axis is mesh-sharded)."""
    dxz, dxr, dxh, drh, dh0 = streams
    h_prev = jnp.concatenate([h0[jnp.newaxis].astype(jnp.float32),
                              hs[:-1].astype(jnp.float32)], axis=0)
    # Cotangent dtype must match the primal's (JAX enforces this for
    # custom_vjp); all current callers feed f32 but keep the symmetry.
    dx_proj = jnp.concatenate([dxz, dxr, dxh], axis=-1).astype(x_dtype)
    hi = jax.lax.Precision.HIGHEST
    d_k = jnp.concatenate(
        [jnp.einsum('tbi,tbj->ij', h_prev, d, precision=hi)
         for d in (dxz, dxr, drh)], axis=-1)
    d_b = jnp.concatenate(
        [d.sum(axis=(0, 1)) for d in (dxz, dxr, drh)], axis=-1)
    return (dx_proj, d_k.astype(rec_kernel.dtype),
            d_b.astype(rec_bias.dtype), dh0)


@functools.partial(jax.jit, static_argnums=(6,))
def gru_scan_pallas_bwd(x_proj: Array, rec_kernel: Array, rec_bias: Array,
                        h0: Array, hs: Array, g: Array,
                        interpret: bool = False):
    """VJP of gru_scan_pallas from its own outputs.

    Args:
        x_proj: (T, B, 3u) input projections (gate order [z, r, h]).
        rec_kernel: (u, 3u); rec_bias: (3u,); h0: (B, u).
        hs: (T, B, u) the forward's hidden states (the only residual).
        g: (T, B, u) cotangent of hs.
    Returns:
        (dx_proj (T, B, 3u), d_rec_kernel (u, 3u), d_rec_bias (3u,),
         dh0 (B, u)) — matching jax.vjp of gru_scan_reference up to
        float32 reassociation.
    """
    t, b, three_u = x_proj.shape
    if _gru_bwd_vmem_bt(b, three_u // 3) is None:
        return _gru_reference_vjp(x_proj.astype(jnp.float32), rec_kernel,
                                  rec_bias, h0, g.astype(jnp.float32))
    streams = _gru_bwd_streams(x_proj, rec_kernel, rec_bias, h0, hs, g,
                               interpret=interpret)
    return _gru_grads_from_streams(rec_kernel, rec_bias, h0, hs, streams,
                                   x_dtype=x_proj.dtype)


# -----------------------------------------------------------------------------
# NoteRelease recurrence (control-path hot loop #3)
# -----------------------------------------------------------------------------


def _note_release_kernel(x_ref, thresh_ref, s0_ref, out_ref, state_out_ref,
                         state_ref, *, bt: int, t_total: int):
    """F0ProcessorCell steps over one (BT, B) pitch block; the (2, B)
    state (held note, release frame count) persists in VMEM scratch.
    Batch rides the 128-lane axis — a trailing (.., B, 1) layout would
    pad the singleton to a full lane tile and VMEM-OOM at the folded
    b=128 aggregate batch (8 MB/block; observed). Same saturated-relu
    math as sub_modules.F0ProcessorCell.step. Steps past t_total
    (time-axis padding) leave the state untouched so the emitted final
    state is the real sequence's."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        state_ref[:] = s0_ref[:]

    thresh = thresh_ref[0, 0]
    base = pl.program_id(0) * bt

    def _sat_relu(x, threshold=0.0):
        return jnp.minimum(jnp.maximum(x - threshold, 0.0), 1.0)

    def body(t, carry):
        prev = state_ref[0:1, :]
        steps = state_ref[1:2, :]
        note = x_ref[pl.dslice(t, 1), :]
        activity = _sat_relu(note)
        release_end = _sat_relu(steps, thresh)
        out = (activity * note
               + (1.0 - activity) * prev * (1.0 - release_end))
        new_steps = (steps + 1.0) * (1.0 - activity) * (1.0 - release_end)
        live = (base + t) < t_total
        state_ref[0:1, :] = jnp.where(live, out, prev)
        state_ref[1:2, :] = jnp.where(live, new_steps, steps)
        out_ref[pl.dslice(t, 1), :] = out
        return carry

    jax.lax.fori_loop(0, bt, body, 0)
    state_out_ref[:] = state_ref[:]


@functools.partial(jax.jit, static_argnums=(3,))
def note_release_scan_pallas(active_pitch: Array, threshold: Array,
                             state0: Array,
                             interpret: bool = False):
    """Run the note-release recurrence in one Pallas program.

    Args:
        active_pitch: (T, B, 1) MIDI pitch conditioning (time-major).
        threshold: scalar release threshold in FRAMES
            (release_duration * frame_rate).
        state0: (B, 2) initial [held note, release steps] state.
    Returns:
        (extended_pitch (T, B, 1), final state (B, 2)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, _ = active_pitch.shape
    bt = 128
    t_pad = -(-t // bt) * bt
    x = active_pitch[..., 0].astype(jnp.float32)   # (T, B): b on lanes
    if t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0)))

    out, final_state = pl.pallas_call(
        functools.partial(_note_release_kernel, bt=bt, t_total=t),
        grid=(t_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # Written every grid step; only the last survives, which is
            # exactly the final state.
            pl.BlockSpec((2, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, b), jnp.float32),
                   jax.ShapeDtypeStruct((2, b), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, b), jnp.float32)],
        interpret=interpret,
    )(x, jnp.reshape(threshold.astype(jnp.float32), (1, 1)),
      state0.astype(jnp.float32).T)
    return out[:t, :, jnp.newaxis], final_state.T


# -----------------------------------------------------------------------------
# NoteRelease backward kernel (round 4: the last scan-linearized recurrence
# in the train step after the GRU backward kernel landed — its native scan
# linearization is ~0.9 ms of the dafx22 value_and_grad,
# benchmarks/profile_ctrl_bwd.py).
#
# Same architecture as the GRU pair: a forward variant that additionally
# streams the pre-update `steps` state (the only residual the backward
# cannot reconstruct by shifting the outputs), and a reverse-walking
# backward kernel with the (d_prev, d_steps) cotangent carry in VMEM.
# Gradient conventions match jax.vjp of note_release_reference exactly,
# including the ties that REAL data hits: d relu(u)/du = 0 at u == 0, and
# d min(r, 1)/dr = 0.5 at r == 1 (steps counts integer frames and the
# threshold can be integral, so steps - threshold lands on 0 and 1).
# -----------------------------------------------------------------------------


def _note_release_res_kernel(x_ref, thresh_ref, s0_ref, out_ref,
                             state_out_ref, steps_out_ref, state_ref,
                             *, bt: int, t_total: int):
    """_note_release_kernel + a (BT, B) stream of the PRE-update steps
    state (the backward's residual)."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        state_ref[:] = s0_ref[:]

    thresh = thresh_ref[0, 0]
    base = pl.program_id(0) * bt

    def _sat_relu(x, threshold=0.0):
        return jnp.minimum(jnp.maximum(x - threshold, 0.0), 1.0)

    def body(t, carry):
        prev = state_ref[0:1, :]
        steps = state_ref[1:2, :]
        note = x_ref[pl.dslice(t, 1), :]
        activity = _sat_relu(note)
        release_end = _sat_relu(steps, thresh)
        out = (activity * note
               + (1.0 - activity) * prev * (1.0 - release_end))
        new_steps = (steps + 1.0) * (1.0 - activity) * (1.0 - release_end)
        live = (base + t) < t_total
        state_ref[0:1, :] = jnp.where(live, out, prev)
        state_ref[1:2, :] = jnp.where(live, new_steps, steps)
        out_ref[pl.dslice(t, 1), :] = out
        steps_out_ref[pl.dslice(t, 1), :] = steps
        return carry

    jax.lax.fori_loop(0, bt, body, 0)
    state_out_ref[:] = state_ref[:]


def _sat_relu_mask(u):
    """d/du of min(relu(u), 1) under JAX's conventions: relu grad is 0 at
    u == 0; the min tie at relu(u) == 1 splits 0.5."""
    r = jnp.maximum(u, 0.0)
    inner = jnp.where(r < 1.0, 1.0, jnp.where(r == 1.0, 0.5, 0.0))
    return jnp.where(u > 0.0, inner, 0.0)


def _note_release_bwd_kernel(x_ref, thresh_ref, prev_ref, steps_ref,
                             g_out_ref, g_state_ref, dx_ref, dthr_ref,
                             dstate0_ref, carry_ref, dthr_acc_ref,
                             *, bt: int, t_total: int):
    """Reverse time block of the F0ProcessorCell VJP.

    carry_ref (2, B) holds (d_prev, d_steps) — the cotangent of the state
    ENTERING the current step; dthr_acc_ref (1, B) accumulates the
    per-lane threshold gradient (summed over batch by the caller). Index
    maps walk time backward; padded steps (t >= t_total) contribute
    nothing and leave the carry untouched, mirroring the forward's
    `live` predicate."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[:] = g_state_ref[:]
        dthr_acc_ref[:] = jnp.zeros_like(dthr_acc_ref)

    thresh = thresh_ref[0, 0]
    # The index maps walk time BACKWARD: grid step i holds time block
    # (nblocks - 1 - i), so the live predicate must use that block's base
    # (the forward kernel's program_id * bt would gate the wrong half).
    base = (pl.num_programs(0) - 1 - pl.program_id(0)) * bt

    def body(t_rev, c):
        t = bt - 1 - t_rev
        note = x_ref[pl.dslice(t, 1), :]
        prev = prev_ref[pl.dslice(t, 1), :]
        steps = steps_ref[pl.dslice(t, 1), :]

        a = jnp.minimum(jnp.maximum(note, 0.0), 1.0)
        u_e = steps - thresh
        e = jnp.minimum(jnp.maximum(u_e, 0.0), 1.0)
        mask_a = _sat_relu_mask(note)
        mask_e = _sat_relu_mask(u_e)
        one_a = 1.0 - a
        one_e = 1.0 - e

        g_o = g_out_ref[pl.dslice(t, 1), :] + carry_ref[0:1, :]
        g_n = carry_ref[1:2, :]

        # out = a*note + (1-a)*prev*(1-e);  ns = (steps+1)*(1-a)*(1-e)
        g_e = -(g_o * prev + g_n * (steps + 1.0)) * one_a
        g_a = g_o * (note - prev * one_e) - g_n * (steps + 1.0) * one_e
        dnote = g_o * a + g_a * mask_a
        dprev_new = g_o * one_a * one_e
        dsteps_new = g_n * one_a * one_e + g_e * mask_e

        live = (base + t) < t_total
        dx_ref[pl.dslice(t, 1), :] = jnp.where(live, dnote, 0.0)
        carry_ref[0:1, :] = jnp.where(live, dprev_new, carry_ref[0:1, :])
        carry_ref[1:2, :] = jnp.where(live, dsteps_new, carry_ref[1:2, :])
        dthr_acc_ref[:] = jnp.where(live,
                                    dthr_acc_ref[:] + g_e * (-mask_e),
                                    dthr_acc_ref[:])
        return c

    jax.lax.fori_loop(0, bt, body, 0)
    dthr_ref[:] = dthr_acc_ref[:]
    dstate0_ref[:] = carry_ref[:]


@functools.partial(jax.jit, static_argnums=(3,))
def note_release_scan_pallas_res(active_pitch: Array, threshold: Array,
                                 state0: Array, interpret: bool = False):
    """Forward with residuals: (out (T,B,1), final (B,2), steps (T,B))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, _ = active_pitch.shape
    bt = 128
    t_pad = -(-t // bt) * bt
    x = active_pitch[..., 0].astype(jnp.float32)
    if t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0)))

    out, final_state, steps = pl.pallas_call(
        functools.partial(_note_release_res_kernel, bt=bt, t_total=t),
        grid=(t_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, b), jnp.float32),
                   jax.ShapeDtypeStruct((2, b), jnp.float32),
                   jax.ShapeDtypeStruct((t_pad, b), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, b), jnp.float32)],
        interpret=interpret,
    )(x, jnp.reshape(threshold.astype(jnp.float32), (1, 1)),
      state0.astype(jnp.float32).T)
    return out[:t, :, jnp.newaxis], final_state.T, steps[:t]


def _note_release_bwd_streams(active_pitch: Array, threshold: Array,
                              prev: Array, steps: Array, g_out: Array,
                              g_state: Array, interpret: bool = False):
    """Batch-parallel NoteRelease VJP streams: (dx (T,B), dthr_vec (1,B),
    dstate0 (2,B)). The cross-batch dthr sum happens at the caller so the
    unit is cleanly batch-shardable (GSPMD inserts the all-reduce)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, _ = active_pitch.shape
    bt = 128
    t_pad = -(-t // bt) * bt
    x = active_pitch[..., 0].astype(jnp.float32)
    g = g_out[..., 0].astype(jnp.float32)
    prev = prev.astype(jnp.float32)
    steps = steps.astype(jnp.float32)
    if t_pad != t:
        pad = ((0, t_pad - t), (0, 0))
        x, g, prev, steps = (jnp.pad(a, pad) for a in (x, g, prev, steps))

    nblocks = t_pad // bt
    rev = lambda i: (nblocks - 1 - i, 0)
    seq_spec = pl.BlockSpec((bt, b), rev, memory_space=pltpu.VMEM)
    rep_spec = lambda r: pl.BlockSpec((r, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    dx, dthr_vec, dstate0 = pl.pallas_call(
        functools.partial(_note_release_bwd_kernel, bt=bt, t_total=t),
        grid=(nblocks,),
        in_specs=[seq_spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  seq_spec, seq_spec, seq_spec, rep_spec(2)],
        out_specs=[seq_spec, rep_spec(1), rep_spec(2)],
        out_shape=[jax.ShapeDtypeStruct((t_pad, b), jnp.float32),
                   jax.ShapeDtypeStruct((1, b), jnp.float32),
                   jax.ShapeDtypeStruct((2, b), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, b), jnp.float32),
                        pltpu.VMEM((1, b), jnp.float32)],
        interpret=interpret,
    )(x, jnp.reshape(threshold.astype(jnp.float32), (1, 1)),
      prev, steps, g, g_state.astype(jnp.float32).T)
    return dx[:t], dthr_vec, dstate0


@functools.partial(jax.jit, static_argnums=(6,))
def note_release_scan_pallas_bwd(active_pitch: Array, threshold: Array,
                                 prev: Array, steps: Array, g_out: Array,
                                 g_state: Array, interpret: bool = False):
    """VJP of the note-release recurrence from saved residuals.

    Args:
        active_pitch: (T, B, 1) forward input.
        threshold: (1,) release threshold in frames.
        prev: (T, B) pre-step held-note state (shifted outputs).
        steps: (T, B) pre-step release counter (res-kernel stream).
        g_out: (T, B, 1) cotangent of the extended-pitch output.
        g_state: (B, 2) cotangent of the final state.
    Returns:
        (dx (T, B, 1), dthreshold (1,), dstate0 (B, 2)) matching jax.vjp
        of note_release_reference bit-for-bit in f32 (tie conventions
        included).
    """
    dx, dthr_vec, dstate0 = _note_release_bwd_streams(
        active_pitch, threshold, prev, steps, g_out, g_state,
        interpret=interpret)
    dthr = jnp.sum(dthr_vec, dtype=jnp.float32).reshape(
        jnp.shape(threshold)).astype(threshold.dtype)
    return dx[:, :, jnp.newaxis], dthr, dstate0.T


def _note_release_reference_vjp(active_pitch, threshold, state0, g_out,
                                g_state):
    """jax.vjp of the reference scan (fallback + parity oracle)."""
    _, pull = jax.vjp(lambda *a: note_release_reference(*a),
                      active_pitch, threshold, state0)
    return pull((g_out, g_state))


# -----------------------------------------------------------------------------
# Dispatchers: jnp reference scans + the custom_vjp/vmap/partitioning stack
# (same layering as the oscillator kernels, ops/oscillator.py:264-383: a
# bare pallas_call has no SPMD partitioning or batching rule, so it must be
# wrapped to shard over the batch mesh instead of replicating, to collapse
# jax.vmap axes into its batch dim, and to route gradients through the
# reference lax.scan VJP).
# -----------------------------------------------------------------------------


def use_pallas_ctrl() -> bool:
    """Control-path Pallas kernels (GRU + NoteRelease) on TPU unless
    DDSP_PIANO_TPU_PALLAS_CTRL=0. Read at trace time."""
    import os

    return (jax.default_backend() == 'tpu'
            and os.environ.get('DDSP_PIANO_TPU_PALLAS_CTRL', '') != '0')


def use_pallas_ctrl_bwd() -> bool:
    """Pallas GRU backward (round 4): DEFAULT ON on TPU;
    DDSP_PIANO_TPU_PALLAS_CTRL_BWD=0 reverts to the round-3 custom_jvp
    routing (jax.grad linearizes the reference scan natively).

    Measured win: dafx22 train step 37.6 -> 30.0 ms median (interleaved
    A/B, benchmarks/ab_ctrl_bwd.py, 6 reps x 30 steps). An earlier A/B
    recorded this kernel as 0.8 ms WORSE — that run was invalid: the old
    VMEM gate (_gru_bwd_vmem_bt) under-budgeted and rejected bt=8 at the
    train shapes (B=96, U=192), so both arms silently ran the scan-VJP
    fallback. Gradient parity vs the scan VJP: exact in f32 (CPU
    interpret tests); ~1e-3 rel on TPU, where the SCAN's matmuls run at
    XLA default (bf16) precision while the kernel accumulates f32.
    Read at trace time."""
    import os

    return (use_pallas_ctrl()
            and os.environ.get('DDSP_PIANO_TPU_PALLAS_CTRL_BWD', '') != '0')


def gru_scan_reference(x_proj: Array, rec_kernel: Array, rec_bias: Array,
                       h0: Array, unroll: int = 16) -> Array:
    """The lax.scan GRU recurrence over precomputed input projections
    (the nn/layers.py step, factored so kernel and VJP share one source
    of truth). x_proj: (T, B, 3u) -> (T, B, u)."""
    u = h0.shape[-1]

    def step(h, xt):
        rec = jnp.matmul(h, rec_kernel) + rec_bias
        xz, xr, xh = xt[:, :u], xt[:, u:2 * u], xt[:, 2 * u:]
        rz, rr, rh = rec[:, :u], rec[:, u:2 * u], rec[:, 2 * u:]
        z = jax.nn.sigmoid(xz + rz)
        r = jax.nn.sigmoid(xr + rr)
        hh = jnp.tanh(xh + r * rh)
        h_new = z * h + (1.0 - z) * hh
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x_proj, unroll=unroll)
    return hs


@functools.lru_cache(maxsize=None)
def _gru_partitioned():
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _run(x_proj, rec_kernel, rec_bias, h0):
        return gru_scan_pallas(x_proj, rec_kernel, rec_bias, h0)

    run_cp = custom_partitioning(_run)

    def _bspec(sh):
        spec = sh.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh,
                             PartitionSpec(None, _bspec(
                                 arg_shapes[0].sharding), None))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        rep2 = NamedSharding(mesh, PartitionSpec(None, None))
        rep1 = NamedSharding(mesh, PartitionSpec(None))
        h0_sh = NamedSharding(mesh, PartitionSpec(b, None))
        return mesh, _run, seq, (seq, rep2, rep1, h0_sh)

    run_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule='i b j, k l, m, b n -> i b n')
    return run_cp


@functools.lru_cache(maxsize=None)
def _gru_batched():
    from jax.custom_batching import custom_vmap

    run_cp = _gru_partitioned()

    @custom_vmap
    def run(x_proj, rec_kernel, rec_bias, h0):
        return run_cp(x_proj, rec_kernel, rec_bias, h0)

    @run.def_vmap
    def _rule(axis_size, in_batched, x_proj, rec_kernel, rec_bias, h0):
        if in_batched[1] or in_batched[2]:
            # Per-instance weights can't collapse into the batch axis;
            # fall back to a sequential map (never hit by the model —
            # params are closed over, not vmapped).
            outs = jax.lax.map(
                lambda a: run(
                    x_proj[a] if in_batched[0] else x_proj,
                    rec_kernel[a] if in_batched[1] else rec_kernel,
                    rec_bias[a] if in_batched[2] else rec_bias,
                    h0[a] if in_batched[3] else h0),
                jnp.arange(axis_size))
            return outs, True
        if not in_batched[0]:
            x_proj = jnp.broadcast_to(x_proj[None],
                                      (axis_size,) + x_proj.shape)
        if not in_batched[3]:
            h0 = jnp.broadcast_to(h0[None], (axis_size,) + h0.shape)
        v, t, b, f = x_proj.shape
        flat_x = jnp.moveaxis(x_proj, 0, 1).reshape(t, v * b, f)
        flat_h0 = h0.reshape(v * b, h0.shape[-1])
        out = run(flat_x, rec_kernel, rec_bias, flat_h0)
        out = jnp.moveaxis(out.reshape(t, v, b, -1), 1, 0)
        return out, True

    return run


@functools.lru_cache(maxsize=None)
def _gru_grad(unroll: int):
    """custom_jvp: outside AD the Pallas kernel runs; under AD the rule
    defers BOTH primal and tangent to the reference scan, so jax.grad
    linearizes the scan natively (saved residuals + transposed backward
    scan) and never touches the kernel. A custom_vjp here double-paid:
    kernel forward + full scan RECOMPUTE in the backward — measured
    +2 ms on the 46.5 ms dafx22 train step. The kernel is an inference
    device; training takes the scan's own gradient path."""

    @jax.custom_jvp
    def run(x_proj, rec_kernel, rec_bias, h0):
        return _gru_batched()(x_proj, rec_kernel, rec_bias, h0)

    @run.defjvp
    def _jvp(primals, tangents):
        return jax.jvp(
            lambda *a: gru_scan_reference(*a, unroll=unroll),
            primals, tangents)

    return run


@functools.lru_cache(maxsize=None)
def _gru_bwd_partitioned():
    """custom_partitioning for the bwd kernel's batch-parallel streams.

    Every operand/result carries the batch axis except the weights/bias
    (replicated); there are NO cross-batch reductions inside (the weight
    gradients are einsums at the caller), so partitioning is the same
    shard-the-batch story as the forward kernel."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _run(x_proj, rec_kernel, rec_bias, h0, hs, g):
        return tuple(_gru_bwd_streams(x_proj, rec_kernel, rec_bias, h0,
                                      hs, g))

    run_cp = custom_partitioning(_run)

    def _bspec(sh):
        spec = sh.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        st = NamedSharding(mesh, PartitionSpec(b, None))
        return (seq, seq, seq, seq, st)

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        rep2 = NamedSharding(mesh, PartitionSpec(None, None))
        rep1 = NamedSharding(mesh, PartitionSpec(None))
        st = NamedSharding(mesh, PartitionSpec(b, None))
        return (mesh, _run, (seq, seq, seq, seq, st),
                (seq, rep2, rep1, st, seq, seq))

    run_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=('t b j, k l, m, b n, t b n, t b n -> '
                       't b n, t b n, t b n, t b n, b n'))
    return run_cp


@functools.lru_cache(maxsize=None)
def _gru_vjp():
    """custom_vjp: Pallas kernel forward AND a Pallas reverse-recurrence
    backward (round 4). The hidden states are the only saved residual;
    the backward recomputes gates in VMEM and the weight grads form as
    bulk einsums (round-3's custom_jvp deferred the whole gradient to the
    native scan linearization — measured 15.2 ms of ctrl backward in the
    34.4 ms dafx22 value_and_grad, the single largest train cost)."""

    @jax.custom_vjp
    def run(x_proj, rec_kernel, rec_bias, h0):
        return _gru_batched()(x_proj, rec_kernel, rec_bias, h0)

    def fwd(x_proj, rec_kernel, rec_bias, h0):
        hs = _gru_batched()(x_proj, rec_kernel, rec_bias, h0)
        return hs, (x_proj, rec_kernel, rec_bias, h0, hs)

    def bwd(res, g):
        x_proj, rec_kernel, rec_bias, h0, hs = res
        t, b, three_u = x_proj.shape
        if _gru_bwd_vmem_bt(b, three_u // 3) is None:
            return _gru_reference_vjp(x_proj.astype(jnp.float32),
                                      rec_kernel, rec_bias, h0,
                                      g.astype(jnp.float32))
        streams = _gru_bwd_partitioned()(x_proj, rec_kernel, rec_bias,
                                         h0, hs, g)
        return _gru_grads_from_streams(rec_kernel, rec_bias, h0, hs,
                                       streams, x_dtype=x_proj.dtype)

    run.defvjp(fwd, bwd)
    return run


def gru_scan(x_proj: Array, rec_kernel: Array, rec_bias: Array, h0: Array,
             unroll: int = 16) -> Array:
    """Front door for nn.GRU: Pallas kernel on TPU (differentiable,
    vmappable, mesh-partitionable), reference lax.scan elsewhere."""
    if use_pallas_ctrl_bwd():
        return _gru_vjp()(x_proj, rec_kernel, rec_bias, h0)
    if use_pallas_ctrl():
        return _gru_grad(unroll)(x_proj, rec_kernel, rec_bias, h0)
    return gru_scan_reference(x_proj, rec_kernel, rec_bias, h0,
                              unroll=unroll)


# -- NoteRelease dispatcher ---------------------------------------------------


def note_release_reference(active_pitch: Array, threshold: Array,
                           state0: Array, unroll: int = 16):
    """lax.scan note-release recurrence (the sub_modules.F0ProcessorCell
    math on time-major input). (T, B, 1) -> ((T, B, 1), (B, 2))."""

    def _sat_relu(x, thr=0.0):
        return jnp.minimum(jax.nn.relu(x - thr), 1.0)

    def step(state, note):
        prev = state[..., 0:1]
        steps = state[..., 1:2]
        activity = _sat_relu(note)
        release_end = _sat_relu(steps, threshold)
        out = (activity * note
               + (1.0 - activity) * prev * (1.0 - release_end))
        new_steps = (steps + 1.0) * (1.0 - activity) * (1.0 - release_end)
        return jnp.concatenate([out, new_steps], axis=-1), out

    final_state, ys = jax.lax.scan(step, state0, active_pitch,
                                   unroll=unroll)
    return ys, final_state


@functools.lru_cache(maxsize=None)
def _note_release_partitioned():
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _run(active_pitch, threshold, state0):
        return tuple(note_release_scan_pallas(active_pitch, threshold,
                                              state0))

    run_cp = custom_partitioning(_run)

    def _bspec(sh):
        spec = sh.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        return (NamedSharding(mesh, PartitionSpec(None, b, None)),
                NamedSharding(mesh, PartitionSpec(b, None)))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        state = NamedSharding(mesh, PartitionSpec(b, None))
        scalar = NamedSharding(mesh, PartitionSpec())
        return mesh, _run, (seq, state), (seq, scalar, state)

    run_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule='i b j, s, b k -> i b j, b k')
    return run_cp


@functools.lru_cache(maxsize=None)
def _note_release_batched():
    from jax.custom_batching import custom_vmap

    run_cp = _note_release_partitioned()

    @custom_vmap
    def run(active_pitch, threshold, state0):
        return run_cp(active_pitch, threshold, state0)

    @run.def_vmap
    def _rule(axis_size, in_batched, active_pitch, threshold, state0):
        if in_batched[1]:
            outs = jax.lax.map(
                lambda a: run(
                    active_pitch[a] if in_batched[0] else active_pitch,
                    threshold[a],
                    state0[a] if in_batched[2] else state0),
                jnp.arange(axis_size))
            return outs, (True, True)
        if not in_batched[0]:
            active_pitch = jnp.broadcast_to(
                active_pitch[None], (axis_size,) + active_pitch.shape)
        if not in_batched[2]:
            state0 = jnp.broadcast_to(state0[None],
                                      (axis_size,) + state0.shape)
        v, t, b, _ = active_pitch.shape
        flat_x = jnp.moveaxis(active_pitch, 0, 1).reshape(t, v * b, 1)
        flat_s0 = state0.reshape(v * b, 2)
        ext, state = run(flat_x, threshold, flat_s0)
        ext = jnp.moveaxis(ext.reshape(t, v, b, 1), 1, 0)
        return (ext, state.reshape(v, b, 2)), (True, True)

    return run


@functools.lru_cache(maxsize=None)
def _note_release_grad(unroll: int):
    """Same AD strategy as _gru_grad: kernel outside AD, native scan
    linearization under it (no forward recompute in the backward)."""

    @jax.custom_jvp
    def run(active_pitch, threshold, state0):
        return _note_release_batched()(active_pitch, threshold, state0)

    @run.defjvp
    def _jvp(primals, tangents):
        return jax.jvp(
            lambda *a: note_release_reference(*a, unroll=unroll),
            primals, tangents)

    return run


@functools.lru_cache(maxsize=None)
def _note_release_res_partitioned():
    """custom_partitioning for the residual-emitting forward."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _run(active_pitch, threshold, state0):
        return tuple(note_release_scan_pallas_res(active_pitch, threshold,
                                                  state0))

    run_cp = custom_partitioning(_run)

    def _bspec(sh):
        spec = sh.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        return (NamedSharding(mesh, PartitionSpec(None, b, None)),
                NamedSharding(mesh, PartitionSpec(b, None)),
                NamedSharding(mesh, PartitionSpec(None, b)))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        stream = NamedSharding(mesh, PartitionSpec(None, b))
        state = NamedSharding(mesh, PartitionSpec(b, None))
        scalar = NamedSharding(mesh, PartitionSpec())
        return mesh, _run, (seq, state, stream), (seq, scalar, state)

    run_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule='i b j, s, b k -> i b j, b k, i b')
    return run_cp


@functools.lru_cache(maxsize=None)
def _note_release_bwd_partitioned():
    """custom_partitioning for the backward streams (batch-shardable;
    the dthr cross-batch sum happens at the caller under GSPMD)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _run(active_pitch, threshold, prev, steps, g_out, g_state):
        return tuple(_note_release_bwd_streams(active_pitch, threshold,
                                               prev, steps, g_out,
                                               g_state))

    run_cp = custom_partitioning(_run)

    def _bspec(sh):
        spec = sh.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        stream = NamedSharding(mesh, PartitionSpec(None, b))
        return (stream,
                NamedSharding(mesh, PartitionSpec(None, b)),
                NamedSharding(mesh, PartitionSpec(None, b)))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        seq = NamedSharding(mesh, PartitionSpec(None, b, None))
        stream = NamedSharding(mesh, PartitionSpec(None, b))
        state = NamedSharding(mesh, PartitionSpec(b, None))
        scalar = NamedSharding(mesh, PartitionSpec())
        return (mesh, _run, (stream, stream, stream),
                (seq, scalar, stream, stream, seq, state))

    run_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule='i b j, s, i b, i b, i b j, b k -> i b, s b, k b')
    return run_cp


@functools.lru_cache(maxsize=None)
def _note_release_vjp():
    """custom_vjp: Pallas kernel forward AND Pallas reverse-recurrence
    backward (round 4 — the NoteRelease analogue of _gru_vjp; the scan
    linearization it replaces is ~0.9 ms of the dafx22 value_and_grad).
    The residual-emitting forward streams the pre-update `steps` state;
    `prev` is reconstructed by shifting the outputs."""

    @jax.custom_vjp
    def run(active_pitch, threshold, state0):
        return _note_release_batched()(active_pitch, threshold, state0)

    def fwd(active_pitch, threshold, state0):
        out, final, steps = _note_release_res_partitioned()(
            active_pitch, threshold, state0)
        return ((out, final),
                (active_pitch, threshold, state0, out, steps))

    def bwd(res, g):
        active_pitch, threshold, state0, out, steps = res
        g_out, g_state = g
        prev = jnp.concatenate(
            [state0[:, 0].astype(jnp.float32)[jnp.newaxis],
             out[:-1, :, 0].astype(jnp.float32)], axis=0)
        dx, dthr_vec, dstate0 = _note_release_bwd_partitioned()(
            active_pitch, threshold, prev, steps, g_out, g_state)
        dthr = jnp.sum(dthr_vec, dtype=jnp.float32).reshape(
            jnp.shape(threshold)).astype(threshold.dtype)
        return (dx[:, :, jnp.newaxis].astype(active_pitch.dtype), dthr,
                dstate0.T.astype(state0.dtype))

    run.defvjp(fwd, bwd)
    return run


def use_pallas_nr_bwd() -> bool:
    """Pallas NoteRelease backward: default OFF — the interleaved train
    A/B measured it a slight NEGATIVE (median 30.5 ms vs 29.7 with the
    scan linearization, slower in 5/6 reps; benchmarks/ab_nr_bwd.py).
    The native scan VJP fuses with its neighbours while the
    residual-emitting forward kernel adds a (T, B) HBM stream.
    DDSP_PIANO_TPU_PALLAS_NR_BWD=1 opts in (requires the ctrl kernels).
    Read at trace time."""
    import os

    override = os.environ.get('DDSP_PIANO_TPU_PALLAS_NR_BWD', '')
    return use_pallas_ctrl() and override == '1'


def note_release_scan(active_pitch: Array, threshold: Array,
                      state0: Array, unroll: int = 16):
    """Front door for sub_modules.NoteRelease (time-major)."""
    if use_pallas_nr_bwd():
        return _note_release_vjp()(active_pitch, threshold, state0)
    if use_pallas_ctrl():
        return _note_release_grad(unroll)(active_pitch, threshold, state0)
    return note_release_reference(active_pitch, threshold, state0,
                                  unroll=unroll)
