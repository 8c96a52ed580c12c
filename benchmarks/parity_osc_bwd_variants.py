"""CPU interpret-mode parity of the oscillator-backward kernel variants
(reduce='mxu', trig='poly4') against the shipped vpu/native baseline.

Round-5 companion to benchmarks/ab_osc_bwd.py (the TPU timing A/B); run
on CPU (forced below — the axon plugin ignores JAX_PLATFORMS) so it never
touches the chip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.kernels.oscillator_pallas import (
    render_framewise_pallas_skip_vjp)
from ddsp_piano_tpu.ops.oscillator import FramewiseOscControls


def main():
    rng = np.random.RandomState(0)
    b, nf, k, up, sr = 2, 40, 24, 64, 16000
    f0 = rng.uniform(50, 4000, (b, nf, 1)).astype(np.float32)
    mult = np.arange(1, k + 1, dtype=np.float32)
    f_lo = (f0 * mult).astype(np.float32)
    f_hi = f_lo * 1.01
    a_lo = rng.uniform(0, 0.1, (b, nf, k)).astype(np.float32)
    a_hi = rng.uniform(0, 0.1, (b, nf, k)).astype(np.float32)
    phase0 = rng.uniform(-np.pi, np.pi, (b, nf, k)).astype(np.float32)
    ctrl = FramewiseOscControls(
        *map(jnp.asarray, (f_lo, f_hi, a_lo, a_hi, phase0)))
    g = jnp.asarray(rng.randn(b, nf * up).astype(np.float32))

    base = render_framewise_pallas_skip_vjp(ctrl, g, up, sr, True,
                                            'native', 'vpu')
    worst = {}
    for trig, red in [('native', 'mxu'), ('poly', 'mxu'),
                      ('poly4', 'vpu'), ('poly4', 'mxu')]:
        got = render_framewise_pallas_skip_vjp(ctrl, g, up, sr, True,
                                               trig, red)
        errs = [float(jnp.max(jnp.abs(a - c)) /
                      (jnp.max(jnp.abs(a)) + 1e-12))
                for a, c in zip(base, got)]
        worst[(trig, red)] = max(errs)
        print(f'{trig:>7} {red}  max rel err per grad:',
              ['%.2e' % e for e in errs])

    # mxu must be an exact reassociation-level match; poly4 a gradient-
    # precision one.
    assert worst[('native', 'mxu')] < 1e-6, worst
    assert worst[('poly4', 'mxu')] < 1e-3, worst
    print('PARITY OK')


if __name__ == '__main__':
    main()
