"""DDSP-Piano TPU: a TPU-native (JAX/XLA/Pallas) differentiable piano synthesis
framework.

A from-scratch rebuild of the capabilities of the reference DDSP-Piano
implementation (lrenault/ddsp-piano, a TensorFlow/ddsp==3.7.0 application),
re-designed TPU-first:

- L0 signal ops as pure JAX functions with fused closed-form phase
  accumulation (``ddsp_piano_tpu.ops``), with Pallas TPU kernels for the hot
  oscillator-bank path (``ddsp_piano_tpu.kernels``).
- A functional neural-network layer library with explicit parameter pytrees
  and Keras-compatible numerics for loading released TF checkpoints
  (``ddsp_piano_tpu.nn``).
- Differentiable processors and a ProcessorGroup DAG runtime, plus a
  vectorized polyphonic fast path that renders all voices batched
  (``ddsp_piano_tpu.processors``, ``ddsp_piano_tpu.models``).
- Host-side MIDI/audio data pipeline with no external MIDI deps
  (``ddsp_piano_tpu.data``).
- A mesh-parallel trainer built on jax.sharding + optax
  (``ddsp_piano_tpu.training``, ``ddsp_piano_tpu.parallel``).
"""

__version__ = "0.1.0"
