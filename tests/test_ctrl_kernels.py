"""Control-path Pallas kernels (GRU + NoteRelease recurrences).

The kernels run the full recurrence in one Pallas program with
VMEM-resident state (kernels/gru_pallas.py); on CPU they run in
interpreter mode via mock-patching, exactly like the oscillator kernel
tests. Checks: bit-parity with the lax.scan reference, gradients through
the custom_vjp wrapper, jax.vmap through the custom_vmap rule, and batch
sharding over the virtual 8-device mesh.
"""

import functools
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.kernels import gru_pallas as gp


def _gru_inputs(B=4, T=100, IN=24, U=64, seed=0):
    rng = np.random.RandomState(seed)
    gru = nn.GRU(U, IN)
    params = gru.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(B, T, IN).astype(np.float32))
    x_proj = jnp.swapaxes(
        jnp.matmul(x, params['kernel']) + params['bias'][0], 0, 1)
    h0 = jnp.zeros((B, U), jnp.float32)
    return gru, params, x, x_proj, h0


def _interpret_kernels():
    """Force the Pallas kernels into interpreter mode (CPU suite)."""
    return (
        mock.patch.object(
            gp, 'gru_scan_pallas',
            functools.partial(gp.gru_scan_pallas.__wrapped__,
                              interpret=True)),
        mock.patch.object(
            gp, 'note_release_scan_pallas',
            functools.partial(gp.note_release_scan_pallas.__wrapped__,
                              interpret=True)),
        mock.patch.object(
            gp, '_gru_bwd_streams',
            functools.partial(gp._gru_bwd_streams.__wrapped__,
                              interpret=True)
            if hasattr(gp._gru_bwd_streams, '__wrapped__')
            else functools.partial(gp._gru_bwd_streams, interpret=True)),
        mock.patch.object(
            gp, 'note_release_scan_pallas_res',
            functools.partial(gp.note_release_scan_pallas_res.__wrapped__,
                              interpret=True)),
        mock.patch.object(
            gp, '_note_release_bwd_streams',
            functools.partial(gp._note_release_bwd_streams,
                              interpret=True)),
        mock.patch.object(gp, 'use_pallas_ctrl', lambda: True),
    )


def test_gru_kernel_bit_matches_scan():
    gru, params, x, x_proj, h0 = _gru_inputs()
    want = gp.gru_scan_reference(x_proj, params['recurrent_kernel'],
                                 params['bias'][1], h0)
    got = gp.gru_scan_pallas.__wrapped__(
        x_proj, params['recurrent_kernel'], params['bias'][1], h0,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gru_reference_matches_nn_gru():
    """The factored reference scan is the nn.GRU recurrence."""
    gru, params, x, x_proj, h0 = _gru_inputs()
    want = gru(params, x)
    got = jnp.swapaxes(
        gp.gru_scan_reference(x_proj, params['recurrent_kernel'],
                              params['bias'][1], h0), 0, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gru_dispatcher_grad_and_vmap():
    """nn.GRU through the forced-pallas dispatcher: values, gradients,
    and vmap all match the scan path."""
    gru, params, x, _, _ = _gru_inputs(T=50)
    import contextlib
    with contextlib.ExitStack() as stack:
        for patch in _interpret_kernels():
            stack.enter_context(patch)
        got = gru(params, x)

        def loss(p):
            return jnp.sum(gru(p, x) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        vmapped = jax.vmap(lambda xi: gru(params, xi[None])[0])(x)
    want = gru(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(want),
                               atol=1e-6)
    want_grads = jax.grad(lambda p: jnp.sum(gru(p, x) ** 2))(params)
    for k in ('kernel', 'recurrent_kernel', 'bias'):
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(want_grads[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_note_release_kernel_matches_reference():
    """Kernel == scan on release-heavy content, including the carried
    state through a T not divisible by the 128-frame block (the padding
    guard must leave the final state untouched)."""
    rng = np.random.RandomState(3)
    B, T = 5, 300
    x = np.zeros((T, B, 1), np.float32)
    for b in range(B):
        for s in range(0, 250, 60 + 10 * b):
            x[s:s + 25, b, 0] = rng.randint(30, 90)
    x = jnp.asarray(x)
    threshold = jnp.asarray([1.1 * 250.0], jnp.float32)
    s0 = jnp.zeros((B, 2), jnp.float32)
    want, want_state = gp.note_release_reference(x, threshold, s0)
    got, got_state = gp.note_release_scan_pallas.__wrapped__(
        x, threshold, s0, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_state),
                                  np.asarray(want_state))


def test_note_release_kernel_folded_aggregate_batch():
    """b=128 (batch 8 x 16 folded voices — the bench aggregate shape).
    Regression: the kernel must keep batch on the LANE axis; a trailing
    (.., B, 1) block layout padded the singleton to a full 128-lane tile
    and VMEM-OOMed on TPU at exactly this shape (16 MB scoped limit)."""
    rng = np.random.RandomState(7)
    T, B = 750, 128
    x = jnp.asarray((rng.rand(T, B, 1) * 90
                     * (rng.rand(T, B, 1) > 0.5)).astype(np.float32))
    threshold = jnp.asarray([37.5], jnp.float32)
    s0 = jnp.zeros((B, 2), jnp.float32)
    want, want_state = gp.note_release_reference(x, threshold, s0)
    got, got_state = gp.note_release_scan_pallas.__wrapped__(
        x, threshold, s0, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_state),
                                  np.asarray(want_state))


def test_note_release_module_dispatcher_parity():
    """sub_modules.NoteRelease through the forced-pallas dispatcher ==
    the reference scan path, including grads w.r.t. release_duration."""
    from ddsp_piano_tpu.models import sub_modules as sm

    nr = sm.NoteRelease(frame_rate=250)
    params = nr.init(jax.random.PRNGKey(0))
    cond = np.zeros((3, 200, 2), np.float32)
    cond[:, 20:70, 0] = 60.0
    cond[:, 120:150, 0] = 72.0
    cond = jnp.asarray(cond)

    want, want_state = nr.apply(params, cond, return_state=True)
    want_grad = jax.grad(
        lambda p: jnp.sum(nr.apply(p, cond) ** 2))(params)
    import contextlib
    with contextlib.ExitStack() as stack:
        for patch in _interpret_kernels():
            stack.enter_context(patch)
        got, got_state = nr.apply(params, cond, return_state=True)
        got_grad = jax.jit(jax.grad(
            lambda p: jnp.sum(nr.apply(p, cond) ** 2)))(params)
        vmapped = jax.vmap(lambda c: nr.apply(params, c[None])[0])(cond)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_state),
                                  np.asarray(want_state))
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_grad['cell']['release_duration']),
        np.asarray(want_grad['cell']['release_duration']),
        rtol=1e-4)


def test_ctrl_kernels_partition_over_batch_mesh():
    """Under a data mesh the GRU kernel shards over the batch axis
    (axis 1 of the time-major layout) instead of replicating."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_piano_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh(8)
    gru, params, x, x_proj, h0 = _gru_inputs(B=16, T=64)
    sharding = NamedSharding(mesh, P(None, 'data', None))
    x_proj_s = jax.device_put(x_proj, sharding)
    h0_s = jax.device_put(h0, NamedSharding(mesh, P('data', None)))

    import contextlib
    with contextlib.ExitStack() as stack:
        for patch in _interpret_kernels():
            stack.enter_context(patch)
        out = jax.jit(lambda xp, h: gp.gru_scan(
            xp, params['recurrent_kernel'], params['bias'][1], h))(
                x_proj_s, h0_s)
    # Trailing Nones may be normalized away; the batch axis must shard.
    assert tuple(out.sharding.spec)[:2] == (None, 'data'), out.sharding
    want = gp.gru_scan_reference(x_proj, params['recurrent_kernel'],
                                 params['bias'][1], h0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6)


def test_f0_processor_cell_step_matches_reference_scan():
    """F0ProcessorCell.step (the public per-step cell API, reference
    sub_modules.py:1113-1170) delegates to note_release_reference; a
    manual Python loop over steps must equal the scan over the sequence."""
    from ddsp_piano_tpu.models import sub_modules as sm

    cell = sm.F0ProcessorCell(frame_rate=250)
    params = cell.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    B, T = 4, 90
    x = np.zeros((T, B, 1), np.float32)
    for b in range(B):
        x[10:40, b, 0] = rng.randint(40, 80)
    x = jnp.asarray(x)

    threshold = jnp.reshape(params['release_duration'] * 250.0, (1,))
    want, want_state = gp.note_release_reference(
        x, threshold, jnp.zeros((B, 2), jnp.float32))

    state = jnp.zeros((B, 2), jnp.float32)
    outs = []
    for t in range(T):
        state, out = cell.step(params, state, x[t])
        outs.append(out)
    np.testing.assert_array_equal(np.asarray(jnp.stack(outs)),
                                  np.asarray(want))
    np.testing.assert_array_equal(np.asarray(state), np.asarray(want_state))


def test_gru_kernel_vmem_fallback_at_huge_folded_batch():
    """b=512 at u=192 exceeds the kernel's VMEM block budget even at the
    minimum 8-step time block; gru_scan_pallas must fall back to the
    lax.scan path instead of dispatching a Mosaic allocation failure.
    interpret=False on the CPU backend would fail at pallas lowering, so
    success here proves the fallback branch was taken."""
    rng = np.random.RandomState(13)
    B, T, U = 512, 12, 192
    x_proj = jnp.asarray(rng.randn(T, B, 3 * U).astype(np.float32))
    rec_k = jnp.asarray(rng.randn(U, 3 * U).astype(np.float32) * 0.05)
    rec_b = jnp.asarray(rng.randn(3 * U).astype(np.float32) * 0.05)
    h0 = jnp.zeros((B, U), jnp.float32)
    want = gp.gru_scan_reference(x_proj, rec_k, rec_b, h0)
    got = gp.gru_scan_pallas.__wrapped__(x_proj, rec_k, rec_b, h0, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gru_bwd_kernel_matches_scan_vjp():
    """The Pallas backward (round 4) == jax.vjp of the reference scan,
    on a T not divisible by the time block and a nonzero h0."""
    rng = np.random.RandomState(11)
    B, T, U = 4, 37, 16
    x_proj = jnp.asarray(rng.randn(T, B, 3 * U).astype(np.float32) * 0.3)
    rec_k = jnp.asarray(rng.randn(U, 3 * U).astype(np.float32) * 0.2)
    rec_b = jnp.asarray(rng.randn(3 * U).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(B, U).astype(np.float32) * 0.5)
    g = jnp.asarray(rng.randn(T, B, U).astype(np.float32))

    hs = gp.gru_scan_reference(x_proj, rec_k, rec_b, h0)
    got = gp.gru_scan_pallas_bwd(x_proj, rec_k, rec_b, h0, hs, g, True)
    want = gp._gru_reference_vjp(x_proj, rec_k, rec_b, h0, g)
    names = ('dx_proj', 'd_rec_kernel', 'd_rec_bias', 'dh0')
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6, err_msg=name)


def test_gru_bwd_vmem_fallback_at_huge_folded_batch():
    """Shapes past the VMEM budget must take the reference-VJP fallback
    (interpret=False on CPU would otherwise fail at pallas lowering)."""
    rng = np.random.RandomState(12)
    B, T, U = 512, 6, 192
    x_proj = jnp.asarray(rng.randn(T, B, 3 * U).astype(np.float32) * 0.1)
    rec_k = jnp.asarray(rng.randn(U, 3 * U).astype(np.float32) * 0.05)
    rec_b = jnp.zeros((3 * U,), jnp.float32)
    h0 = jnp.zeros((B, U), jnp.float32)
    g = jnp.asarray(rng.randn(T, B, U).astype(np.float32))
    hs = gp.gru_scan_reference(x_proj, rec_k, rec_b, h0)
    got = gp.gru_scan_pallas_bwd(x_proj, rec_k, rec_b, h0, hs, g, False)
    want = gp._gru_reference_vjp(x_proj, rec_k, rec_b, h0, g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_note_release_bwd_kernel_matches_scan_vjp():
    """The round-4 NoteRelease backward kernel == jax.vjp of the
    reference scan, on release-heavy content with an INTEGRAL threshold
    so steps - threshold lands exactly on the relu/min gradient ties
    (steps counts integer frames), T not divisible by the 128-frame
    block, nonzero state0, and a nonzero final-state cotangent."""
    rng = np.random.RandomState(5)
    T, B = 300, 6
    x = np.zeros((T, B, 1), np.float32)
    for b in range(B):
        for s in range(0, 250, 60 + 10 * b):
            x[s:s + 20, b, 0] = rng.randint(30, 90)
    x[:, 3, 0] = 0.25        # fractional pitch: interior of the relu
    x = jnp.asarray(x)
    threshold = jnp.asarray([6.0], jnp.float32)   # integral -> ties hit
    s0 = jnp.asarray(rng.randn(B, 2).astype(np.float32) ** 2)
    g_out = jnp.asarray(rng.randn(T, B, 1).astype(np.float32))
    g_state = jnp.asarray(rng.randn(B, 2).astype(np.float32))

    out, final, steps = gp.note_release_scan_pallas_res.__wrapped__(
        x, threshold, s0, interpret=True)
    want_ys, want_state = gp.note_release_reference(x, threshold, s0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want_ys))
    np.testing.assert_array_equal(np.asarray(final),
                                  np.asarray(want_state))

    prev = jnp.concatenate([s0[:, 0][jnp.newaxis], out[:-1, :, 0]],
                           axis=0)
    got = gp.note_release_scan_pallas_bwd(x, threshold, prev, steps,
                                          g_out, g_state, True)
    want = gp._note_release_reference_vjp(x, threshold, s0, g_out,
                                          g_state)
    for name, a, b in zip(('dx', 'dthreshold', 'dstate0'), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_note_release_bwd_dispatcher_custom_vjp_route():
    """NoteRelease module grads through the round-4 custom_vjp route
    (kernel forward + kernel backward, interpreted) == the reference
    scan grads, including release_duration."""
    import contextlib

    from ddsp_piano_tpu.models import sub_modules as sm

    nr = sm.NoteRelease(frame_rate=250)
    params = nr.init(jax.random.PRNGKey(0))
    cond = np.zeros((3, 200, 2), np.float32)
    cond[:, 20:70, 0] = 60.0
    cond[:, 120:150, 0] = 72.0
    cond = jnp.asarray(cond)

    def loss(p):
        return jnp.sum(nr.apply(p, cond) ** 2)

    want_grad = jax.grad(loss)(params)
    with contextlib.ExitStack() as stack:
        for patch in _interpret_kernels():
            stack.enter_context(patch)
        stack.enter_context(
            mock.patch.object(gp, 'use_pallas_nr_bwd', lambda: True))
        got = nr.apply(params, cond)
        got_grad = jax.jit(jax.grad(loss))(params)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(nr.apply(params, cond)))
    np.testing.assert_allclose(
        np.asarray(got_grad['cell']['release_duration']),
        np.asarray(want_grad['cell']['release_duration']), rtol=1e-5)


def test_gru_bwd_dispatcher_custom_vjp_route():
    """nn.GRU grads through the round-4 custom_vjp dispatcher (kernel
    forward + kernel backward, both interpreted) == the scan VJP."""
    import contextlib

    gru, params, x, _, _ = _gru_inputs(T=50)
    want_grads = jax.grad(lambda p: jnp.sum(gru(p, x) ** 2))(params)
    with contextlib.ExitStack() as stack:
        for patch in _interpret_kernels():
            stack.enter_context(patch)
        stack.enter_context(
            mock.patch.object(gp, 'use_pallas_ctrl_bwd', lambda: True))
        got_grads = jax.jit(jax.grad(
            lambda p: jnp.sum(gru(p, x) ** 2)))(params)
    for k in ('kernel', 'recurrent_kernel', 'bias'):
        np.testing.assert_allclose(np.asarray(got_grads[k]),
                                   np.asarray(want_grads[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
