"""Packed host->device batch staging with a 16-bit wire format.

Through a relayed / remotely-attached chip, staging a training batch as a
dict pays a fixed per-``device_put`` cost once per KEY, and the wire
bytes themselves move at relay bandwidth (measured 38-126 MB/s depending
on the hour — benchmarks/profile_relay_staging.py).  Both costs are
attacked here:

* the whole batch packs into ONE contiguous ``(batch, width)`` uint16
  array -> one transfer instead of one per key;
* each key is wire-encoded in the narrowest 16-bit lane that round-trips
  BIT-EXACTLY, halving wire bytes for production data.

Encodings, chosen per key from the template batch (first match whose
host-side encode/decode reproduces the input bit-for-bit):

  u16       integer-valued data in [0, 65535] stored as uint16
            (pedal 0/1 rolls, active rolls, instrument ids)
  i16*s     round(a*s) in int16 with s in {32768, 127}; decoded as
            ``astype(f32)/s``.  s=32768 is wav provenance: the pipeline
            decodes 16-bit PCM as ``int16/32768`` (data/audio_io.py:24),
            so the audio key re-quantizes losslessly.  s=127 is MIDI
            provenance: onset velocities are stored as ``velocity/127``
            (data/midi.py:307) and pitches are small integers.
  f16       values that survive ``astype(f16).astype(f32)`` unchanged
  f32x2     always-exact fallback: the f32 bit pattern split into two
            uint16 lanes (hi, lo) and reassembled on device

Every encoding is verified bitwise on the template AND on every later
batch (a few ms of host numpy per 1.8 MB batch, hidden by
``Trainer.device_prefetch``); a batch that stops round-tripping raises
instead of silently degrading.  Decoding happens INSIDE the jitted train
step (slice + bitcast + cast — fused by XLA, zero extra dispatches), so
numerics are bit-identical to dict staging by construction.

Reference hot path modeled: /root/reference/train_single_phase.py:182-187
(tf.data prefetch feeding strategy.run).
"""
from typing import Dict, List, Sequence

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['BatchPacker']

_SKIP_KEYS = ('filename',)

# Scales with data provenance (see module docstring); order matters —
# first bitwise match wins, and 32768 (audio) is cheaper to check first
# on the largest key.
_I16_SCALES = (32768.0, 127.0)


def _encode_u16(a):
    return a.astype(np.uint16)[..., None]


def _encode_i16(a, scale):
    return (np.round(a * scale).astype(np.int16)
            .view(np.uint16)[..., None])


def _encode_f16(a):
    return a.astype(np.float16).view(np.uint16)[..., None]


def _encode_f32x2(a):
    bits = np.ascontiguousarray(a, np.float32).view(np.uint32)
    return np.stack([(bits >> 16).astype(np.uint16),
                     (bits & 0xffff).astype(np.uint16)], axis=-1)


def _u16_ok(a, dtype):
    if np.issubdtype(dtype, np.integer):
        return bool(a.size == 0 or (a.min() >= 0 and a.max() <= 0xffff))
    d = a.astype(np.uint16).astype(np.float32)
    return bool(np.array_equal(d, a) and (a.size == 0 or a.min() >= 0))


def _i16_ok(a, scale):
    q = np.round(a * scale)
    if a.size and (q.min() < -32768 or q.max() > 32767):
        return False
    # Decode exactly as the device will: f32 cast then f32 divide.
    d = q.astype(np.int16).astype(np.float32) / np.float32(scale)
    return bool(np.array_equal(d, a))


def _f16_ok(a):
    return bool(np.array_equal(a.astype(np.float16).astype(np.float32), a))


class BatchPacker:
    """Packs a host batch dict into one ``(batch, width)`` uint16 array.

    Built from a template batch; every later batch must carry the same
    keys, per-sample shapes, and dtypes (the fixed-shape contract the
    jitted train step already imposes) and satisfy the per-key wire
    encodings chosen from the template. ``wire=False`` forces the f32x2
    lane for every key (no compression, no per-batch checks beyond
    integer range).
    """

    def __init__(self, template: Dict[str, np.ndarray], wire: bool = True):
        self.specs = []  # (key, tail_shape, dtype, enc, offset, lanes*size)
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
                enc = 'u16' if (wire and _u16_ok(a, a.dtype)) else 'i32x2'
            elif a.dtype == np.float32:
                enc = 'f32x2'
                if wire:
                    f = a
                    if _u16_ok(f, a.dtype):
                        enc = 'u16'
                    else:
                        for s in _I16_SCALES:
                            if _i16_ok(f, s):
                                enc = f'i16x{int(s)}'
                                break
                        else:
                            if _f16_ok(f):
                                enc = 'f16'
            else:
                raise ValueError(
                    f"BatchPacker supports float32 and integer keys; "
                    f"{key!r} is {a.dtype} — stage this batch as a dict.")
            size = int(np.prod(a.shape[1:], dtype=np.int64))
            lanes = 2 if enc.endswith('x2') else 1
            self.specs.append((key, a.shape[1:], a.dtype, enc, offset,
                               lanes * size))
            offset += lanes * size
        if not self.specs:
            raise ValueError("Empty batch — nothing to pack.")
        self.width = offset

    def _encode(self, key, a, dtype, enc):
        """-> (..., size, lanes) uint16, verifying bit-exactness."""
        if enc == 'u16':
            if not _u16_ok(a, dtype):
                raise ValueError(
                    f"{key!r} no longer fits the u16 wire encoding chosen "
                    f"from the template batch — use --staging packed32 "
                    f"(or stage as a dict).")
            return _encode_u16(a)
        if enc.startswith('i16x'):
            scale = float(enc[4:])
            if not _i16_ok(a, scale):
                raise ValueError(
                    f"{key!r} no longer round-trips the i16*{scale:g} wire "
                    f"encoding chosen from the template batch — use "
                    f"--staging packed32 (or stage as a dict).")
            return _encode_i16(a, scale)
        if enc == 'f16':
            if not _f16_ok(a):
                raise ValueError(
                    f"{key!r} no longer round-trips the f16 wire encoding "
                    f"chosen from the template batch — use --staging "
                    f"packed32 (or stage as a dict).")
            return _encode_f16(a)
        if enc == 'i32x2':
            bits = np.ascontiguousarray(a, np.int32).view(np.uint32)
            return np.stack([(bits >> 16).astype(np.uint16),
                             (bits & 0xffff).astype(np.uint16)], axis=-1)
        return _encode_f32x2(a)  # 'f32x2'

    def pack(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """One host batch dict -> ``(batch, width)`` uint16 array."""
        b = np.asarray(batch[self.specs[0][0]]).shape[0]
        out = np.empty((b, self.width), np.uint16)
        for key, tail, dtype, enc, off, span in self.specs:
            a = np.asarray(batch[key])
            out[:, off:off + span] = self._encode(
                key, a, dtype, enc).reshape(b, -1)
        return out

    def pack_block(self, batches: Sequence[Dict[str, np.ndarray]]
                   ) -> np.ndarray:
        """K host batches -> ``(K, batch, width)`` uint16 array."""
        return np.stack([self.pack(b) for b in batches])

    def unpack(self, packed) -> Dict[str, jnp.ndarray]:
        """Traced inverse of pack: ``(..., width)`` -> batch dict.

        Works on any leading shape, so the same packer serves the single
        step (``(b, width)``) and each scan slice of a packed K-block.
        Bitcasts/casts/slices fuse into the consuming program.
        """
        lead = packed.shape[:-1]
        out = {}
        for key, tail, dtype, enc, off, span in self.specs:
            w = packed[..., off:off + span]
            if enc == 'u16':
                v = w.astype(dtype)
            elif enc.startswith('i16x'):
                scale = jnp.float32(float(enc[4:]))
                v = lax.bitcast_convert_type(
                    w, jnp.int16).astype(jnp.float32) / scale
            elif enc == 'f16':
                v = lax.bitcast_convert_type(
                    w, jnp.float16).astype(jnp.float32)
            else:  # f32x2 / i32x2: reassemble (hi, lo) lane pairs
                pair = w.reshape(lead + (span // 2, 2)).astype(jnp.uint32)
                bits = (pair[..., 0] << 16) | pair[..., 1]
                v = lax.bitcast_convert_type(
                    bits, jnp.float32 if enc == 'f32x2' else jnp.int32)
            out[key] = v.reshape(lead + tuple(tail))
        return out

    def keys(self) -> List[str]:
        return [s[0] for s in self.specs]

    def encodings(self) -> Dict[str, str]:
        """Per-key wire encodings (for logging / tests)."""
        return {s[0]: s[3] for s in self.specs}

    def wire_bytes(self, batch_dim: int) -> int:
        return 2 * batch_dim * self.width
