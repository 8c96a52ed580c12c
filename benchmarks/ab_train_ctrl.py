"""Interleaved A/B: dafx22 train step (b=6, 3 s recipe shapes) with the
control-path Pallas kernels ON vs OFF.

NOTE: under jax.grad the ctrl kernels' custom_jvp rule defers BOTH primal
and tangent to the reference lax.scan (gru_pallas._gru_grad), so the two
arms linearize the *same* program and the expected delta is ZERO. This
script is a double-pay detector, not a speedup measurement: the earlier
custom_vjp routing cost +2 ms/step (kernel forward + full scan recompute
in the backward) and this harness is what caught it. Any nonzero delta
here is either relay noise or a regression in the AD routing.

Build/run protocol shared with the other A/B scripts in
benchmarks/_ab_common.py (each arm traced eagerly under its own env)."""
from _ab_common import build_train_arm, time_steps


def main():
    on = build_train_arm({'DDSP_PIANO_TPU_PALLAS_CTRL': '1'})[:3]
    off = build_train_arm({'DDSP_PIANO_TPU_PALLAS_CTRL': '0'})[:3]
    on_ms = []
    off_ms = []
    for rep in range(6):
        ms, _ = time_steps(*on)
        on_ms.append(ms)
        ms, _ = time_steps(*off)
        off_ms.append(ms)
        print('rep %d: ctrl_on %.1f ms  ctrl_off %.1f ms'
              % (rep, on_ms[-1], off_ms[-1]), flush=True)
    print('median: ctrl_on %.1f ms  ctrl_off %.1f ms'
          % (sorted(on_ms)[len(on_ms) // 2],
             sorted(off_ms)[len(off_ms) // 2]), flush=True)


if __name__ == '__main__':
    main()
