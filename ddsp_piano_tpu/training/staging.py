"""Packed host->device batch staging.

Through a relayed / remotely-attached chip every ``device_put`` pays a
fixed per-transfer cost on top of the wire bytes.  A training batch
staged as a dict pays that fixed cost once per KEY; packing the whole
batch into ONE contiguous ``(batch, width)`` float32 array makes staging
a single transfer, small enough to hide behind the in-flight step via
``Trainer.device_prefetch``.  Unpacking happens INSIDE the jitted train
step (slice + reshape + cast — fused by XLA, zero extra dispatches).

The roundtrip is EXACT: float32 keys are copied bit-for-bit; integer
keys are cast through float32, exact for ``|v| < 2**24`` (the only
integer key on the reference's recipes, ``piano_model``, holds
instrument ids < 2**7 — see /root/reference/ddsp_piano/data_pipeline.py
feature spec).

Measured on the relayed v5e (benchmarks/profile_relay_staging.py, dafx22
recipe b=6, 3 s = 1.8 MB/batch): dict staging 49.5 ms/batch while a raw
single-array put of the same bytes is 14.3 ms (126 MB/s) — the per-key
fixed cost, not bandwidth, dominates.  Packed staging turns the 53 ms
end-to-end CLI step (vs 27.7 ms on-chip) into a staging cost that fits
under the compute window.
"""
from typing import Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

__all__ = ['BatchPacker']

_SKIP_KEYS = ('filename',)


class BatchPacker:
    """Packs a host batch dict into one ``(batch, width)`` float32 array.

    Built from a template batch; every later batch must carry the same
    keys, per-sample shapes, and dtypes (the fixed-shape contract the
    jitted train step already imposes).
    """

    def __init__(self, template: Dict[str, np.ndarray]):
        self.specs = []  # (key, tail_shape, dtype, offset, size)
        offset = 0
        batch_dim = None
        for key in sorted(template):
            if key in _SKIP_KEYS:
                continue
            a = np.asarray(template[key])
            if a.ndim < 1:
                raise ValueError(
                    f"BatchPacker needs a leading batch axis on every key; "
                    f"{key!r} is a scalar — stage this batch as a dict.")
            if batch_dim is None:
                batch_dim = a.shape[0]
            elif a.shape[0] != batch_dim:
                raise ValueError(
                    f"Inconsistent batch dim: {key!r} has {a.shape[0]}, "
                    f"expected {batch_dim}.")
            if np.issubdtype(a.dtype, np.integer):
                info = np.iinfo(a.dtype)
                if info.max >= 2 ** 24:
                    # Values could exceed exact-f32 integer range; checked
                    # per-batch in pack() instead of rejecting the key.
                    pass
            elif a.dtype != np.float32:
                raise ValueError(
                    f"BatchPacker supports float32 and integer keys; "
                    f"{key!r} is {a.dtype} — stage this batch as a dict.")
            size = int(np.prod(a.shape[1:], dtype=np.int64))
            self.specs.append((key, a.shape[1:], a.dtype, offset, size))
            offset += size
        if not self.specs:
            raise ValueError("Empty batch — nothing to pack.")
        self.width = offset

    def pack(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """One host batch dict -> ``(batch, width)`` float32 array."""
        b = np.asarray(batch[self.specs[0][0]]).shape[0]
        out = np.empty((b, self.width), np.float32)
        for key, tail, dtype, off, size in self.specs:
            a = np.asarray(batch[key])
            if np.issubdtype(dtype, np.integer) and a.size:
                amax = np.abs(a).max()
                if amax >= 2 ** 24:
                    raise ValueError(
                        f"{key!r} holds integers up to {amax}, beyond the "
                        f"exact float32 range — stage this batch as a dict.")
            out[:, off:off + size] = a.reshape(b, -1)
        return out

    def pack_block(self, batches: Sequence[Dict[str, np.ndarray]]
                   ) -> np.ndarray:
        """K host batches -> ``(K, batch, width)`` float32 array."""
        return np.stack([self.pack(b) for b in batches])

    def unpack(self, packed) -> Dict[str, jnp.ndarray]:
        """Traced inverse of pack: ``(..., width)`` -> batch dict.

        Works on any leading shape, so the same packer serves the single
        step (``(b, width)``) and each scan slice of a packed K-block.
        Slices/reshapes/casts fuse into the consuming program.
        """
        lead = packed.shape[:-1]
        out = {}
        for key, tail, dtype, off, size in self.specs:
            v = packed[..., off:off + size].reshape(lead + tuple(tail))
            out[key] = v.astype(dtype) if dtype != np.float32 else v
        return out

    def keys(self) -> List[str]:
        return [s[0] for s in self.specs]
