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
        rz = jnp.dot(h, wz_ref[:], preferred_element_type=jnp.float32)
        rr = jnp.dot(h, wr_ref[:], preferred_element_type=jnp.float32)
        rh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(xz_ref[t] + rz + bz)
        r = jax.nn.sigmoid(xr_ref[t] + rr + br)
        hh = jnp.tanh(xh_ref[t] + r * (rh + bh))
        h_new = z * h + (1.0 - z) * hh
        h_ref[:] = h_new
        out_ref[t] = h_new
        return carry

    jax.lax.fori_loop(0, bt, body, 0)


@functools.partial(jax.jit, static_argnums=(4, 5))
def gru_scan_pallas(x_proj: Array, rec_kernel: Array, rec_bias: Array,
                    h0: Array, unused_unroll: int = 0,
                    interpret: bool = False) -> Array:
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

    # Pre-split gates so in-kernel tensors are (B, u) lane-aligned.
    xz, xr, xh = (x_proj[..., :u], x_proj[..., u:2 * u], x_proj[..., 2 * u:])
    wz, wr, wh = (rec_kernel[:, :u], rec_kernel[:, u:2 * u],
                  rec_kernel[:, 2 * u:])
    biases = jnp.stack([rec_bias[:u], rec_bias[u:2 * u], rec_bias[2 * u:]])

    # Time block: bounded so 3 input + 1 output (BT, B, u) blocks fit VMEM
    # (~16 MB/core) with double buffering alongside the 3 (u, u) weights.
    bt = 64
    while bt > 8 and 8 * bt * b * u * 4 > 8 << 20:
        bt //= 2
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
