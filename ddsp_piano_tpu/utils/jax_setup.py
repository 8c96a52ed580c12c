"""Process-level JAX configuration helpers for CLIs and benchmarks."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache.

    First compiles of the full model (and especially Pallas kernels under
    the remote-compile relay) take minutes; the persistent cache makes
    every subsequent process start hit warm. Safe to call multiple times.

    Also enables the partitionable threefry PRNG: its counter-based stream
    shards cleanly across a mesh (no cross-device broadcast of random
    bits), and interleaved A/B runs of the training step show it is
    performance-neutral on-chip. Note this changes the random STREAM for
    a given key (pinned-render goldens were regenerated accordingly).
    """
    import jax

    jax.config.update('jax_threefry_partitionable', True)
    cache_dir = (cache_dir
                 or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                 or os.path.expanduser('~/.cache/ddsp_piano_tpu/jax'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass  # older jax or read-only fs: carry on without the cache
    return cache_dir


def profile_trace(logdir: str = '/tmp/ddsp_piano_tpu_profile'):
    """Context manager: capture a jax.profiler trace viewable in
    TensorBoard's profile plugin (the framework's tracing hook; the
    reference has none — SURVEY §5)."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def _trace():
        jax.profiler.start_trace(logdir)
        try:
            yield logdir
        finally:
            jax.profiler.stop_trace()

    return _trace()


def collect_garbage():
    """API-parity counterpart of the reference's collect_garbage
    (io_utils.py:256-259: gc + Keras session reset). JAX holds no
    per-epoch graph state, so only host garbage collection applies; jit
    caches are intentionally kept (clearing them would recompile every
    epoch)."""
    import gc

    gc.collect()


def enable_debug_nans():
    """Trap NaNs at the op level (jax_debug_nans): heavier than the
    trainer's per-step loss guard, but pinpoints the producing op."""
    import jax

    jax.config.update('jax_debug_nans', True)
