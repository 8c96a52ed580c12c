"""Neural layers with Keras-compatible numerics.

The released reference checkpoints were trained with Keras layers (Dense,
GRU v2 with reset_after, LayerNormalization) and ddsp helper layers
(Normalize, Fc/FcStack; confirmed against the shipped checkpoint variable
shapes, e.g. GRU bias (2, 3u) in model_weights/dafx22/ckpt-0). These JAX
layers reproduce those numerics exactly so imported weights are
bit-compatible, while using TPU-idiomatic compute:

- GRU precomputes all input projections as one big time-batched matmul
  (MXU-friendly) and scans only the small recurrent update.
- No Python-level control flow depends on traced values.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.nn.module import Module, Sequential

Array = jax.Array


def leaky_relu(x, alpha: float = 0.2):
    """tf.nn.leaky_relu default (alpha=0.2; jax.nn default differs)."""
    return jnp.where(x >= 0, x, alpha * x)


def relu(x):
    return jax.nn.relu(x)


ACTIVATIONS = {
    None: lambda x: x,
    'linear': lambda x: x,
    'leaky_relu': leaky_relu,
    'relu': relu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
}


def _resolve_activation(activation):
    if callable(activation):
        return activation
    try:
        return ACTIVATIONS[activation]
    except KeyError:
        raise ValueError(f"Unknown activation {activation!r}") from None


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


# Opt-in bf16 control-network matmuls (Dense/GRU): inputs and kernels cast
# to bfloat16, products accumulated/returned in float32; the synthesis path
# is untouched. OFF by default — the Keras-parity numerics pinned by the
# golden tests are fp32. Set before building/jitting a model (the flag is
# read at trace time). Measured round 2 on TPU v5e with released dafx22
# weights: +3.8 % throughput (330x -> 342x on the maestro-v2 bench scene),
# spectral distance 0.28 % of the render-vs-silence distance, peak
# waveform delta 0.83 % — inside the 1 % budget, so available for serving,
# but too small a win to justify changing the default numerics.
_BF16_MATMUL = False


def enable_bf16_control(enabled: bool = True):
    global _BF16_MATMUL
    _BF16_MATMUL = bool(enabled)


def _mm(x, kernel):
    if _BF16_MATMUL:
        return jnp.matmul(x.astype(jnp.bfloat16),
                          kernel.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.matmul(x, kernel)


class Dense(Module):
    """Keras-compatible Dense: y = act(x @ kernel + bias)."""

    def __init__(self, units: int, in_features: int,
                 activation=None, use_bias: bool = True,
                 kernel_init: str = 'glorot_uniform',
                 name: Optional[str] = None):
        self.units = units
        self.in_features = in_features
        self.activation = _resolve_activation(activation)
        self.use_bias = use_bias
        self.kernel_init = kernel_init
        self.name = name

    def init(self, key):
        if self.kernel_init == 'zeros':
            kernel = jnp.zeros((self.in_features, self.units), jnp.float32)
        else:
            kernel = glorot_uniform(key, (self.in_features, self.units))
        params = {'kernel': kernel}
        if self.use_bias:
            params['bias'] = jnp.zeros((self.units,), jnp.float32)
        return params

    def apply(self, params, x, **_):
        y = _mm(x, params['kernel'])
        if self.use_bias:
            y = y + params['bias']
        return self.activation(y)


class Activation(Module):
    """Stateless activation wrapper (for Sequential parity with Keras)."""

    def __init__(self, activation):
        self.activation = _resolve_activation(activation)

    def apply(self, params, x, **_):
        return self.activation(x)


class LayerNormalization(Module):
    """Keras LayerNormalization: per-step last-axis norm, epsilon=1e-3."""

    def __init__(self, features: int, epsilon: float = 1e-3,
                 name: Optional[str] = None):
        self.features = features
        self.epsilon = epsilon
        self.name = name

    def init(self, key):
        return {'gamma': jnp.ones((self.features,), jnp.float32),
                'beta': jnp.zeros((self.features,), jnp.float32)}

    def apply(self, params, x, **_):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xn * params['gamma'] + params['beta']


class Normalize(Module):
    """ddsp ``nn.Normalize``: normalize over all non-batch axes.

    For a sequence (batch, time, ch) the statistics pool over *time and
    channels jointly* (the ddsp 'layer' group-norm applied to a 4-D view),
    with learnable scale/shift stored as [1, 1, 1, ch] for checkpoint
    compatibility. eps = 1e-5.
    """

    def __init__(self, features: int, norm_type: str = 'layer',
                 epsilon: float = 1e-5, name: Optional[str] = None):
        if norm_type != 'layer':
            raise NotImplementedError(
                f"Only 'layer' normalize is used by the reference models, "
                f"got {norm_type!r}")
        self.features = features
        self.epsilon = epsilon
        self.name = name

    def init(self, key):
        return {'scale': jnp.ones((1, 1, 1, self.features), jnp.float32),
                'shift': jnp.zeros((1, 1, 1, self.features), jnp.float32)}

    def apply(self, params, x, **_):
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        return self._affine(params, x, mean, var)

    def apply_with_stats(self, params, x, mean, var):
        """Normalize with externally-supplied statistics.

        Streaming exactness hook: the reference semantics pool mean/var over
        the WHOLE sequence, so chunked inference first sweeps the file to
        accumulate them (models/streaming.py) and then normalizes every
        chunk with these fixed whole-file values. mean/var broadcast
        against x (typically (batch, 1, 1))."""
        return self._affine(params, x, mean, var)

    def _affine(self, params, x, mean, var):
        xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = params['scale'].reshape(-1)
        shift = params['shift'].reshape(-1)
        return xn * scale + shift


class Embedding(Module):
    """Keras Embedding (default uniform(-0.05, 0.05) initializer)."""

    def __init__(self, input_dim: int, output_dim: int,
                 embeddings_init: str = 'uniform',
                 init_mean: float = 0.0, init_stddev: float = 0.05,
                 name: Optional[str] = None):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.embeddings_init = embeddings_init
        self.init_mean = init_mean
        self.init_stddev = init_stddev
        self.name = name

    def init(self, key):
        shape = (self.input_dim, self.output_dim)
        if self.embeddings_init == 'uniform':
            e = jax.random.uniform(key, shape, jnp.float32, -0.05, 0.05)
        elif self.embeddings_init == 'zeros':
            e = jnp.zeros(shape, jnp.float32)
        elif self.embeddings_init == 'ones':
            e = jnp.ones(shape, jnp.float32)
        elif self.embeddings_init == 'normal':
            e = (self.init_mean + self.init_stddev
                 * jax.random.normal(key, shape, jnp.float32))
        else:
            raise ValueError(
                f"Unknown embeddings_init {self.embeddings_init!r}")
        return {'embeddings': e}

    def apply(self, params, ids, **_):
        ids = jnp.asarray(ids)
        if jnp.issubdtype(ids.dtype, jnp.floating):
            ids = ids.astype(jnp.int32)
        # Clip out-of-range ids (JAX's default OOB fill would inject NaNs
        # into the whole render for a bad instrument id).
        return jnp.take(params['embeddings'], ids, axis=0, mode='clip')


class GRU(Module):
    """Keras GRU v2 (reset_after=True) as a lax.scan.

    kernel (in, 3u), recurrent_kernel (u, 3u), bias (2, 3u); gate order
    [z, r, h]:

        z = sig(x Wz + b_iz + h Uz + b_rz)
        r = sig(x Wr + b_ir + h Ur + b_rr)
        hh = tanh(x Wh + b_ih + r * (h Uh + b_rh))
        h' = z * h + (1 - z) * hh

    The input projection for all timesteps is hoisted out of the scan into
    one large matmul.
    """

    def __init__(self, units: int, in_features: int,
                 return_sequences: bool = True, unroll: int = 16,
                 name: Optional[str] = None):
        self.units = units
        self.in_features = in_features
        self.return_sequences = return_sequences
        # lax.scan unroll factor: the recurrent matmuls are tiny, so the
        # sequential scans dominate forward latency on TPU; unrolling
        # amortizes per-step loop overhead (8 -> 16 measured 4.51 ->
        # 4.09 ms on the round-2 bench forward; 32 gains nothing more).
        self.unroll = unroll
        self.name = name

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            'kernel': glorot_uniform(k1, (self.in_features, 3 * self.units)),
            'recurrent_kernel': orthogonal(k2, (self.units, 3 * self.units)),
            'bias': jnp.zeros((2, 3 * self.units), jnp.float32),
        }

    def apply(self, params, x, initial_state: Optional[Array] = None,
              return_state: bool = False, **_):
        """x: (batch, time, in_features) -> (batch, time, units)."""
        u = self.units
        b, t, _ = x.shape
        x_proj = _mm(x, params['kernel']) + params['bias'][0]
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (time, batch, 3u)
        h0 = (jnp.zeros((b, u), x.dtype) if initial_state is None
              else initial_state)
        rec_kernel = params['recurrent_kernel']
        rec_bias = params['bias'][1]

        if not _BF16_MATMUL:
            # TPU: single Pallas program with VMEM-resident state (bit-
            # compatible with the scan; ~1.15x on the latency-bound
            # recurrence); elsewhere the same lax.scan as below. The bf16
            # opt-in keeps the scan so _mm's cast applies per step.
            from ddsp_piano_tpu.kernels.gru_pallas import gru_scan
            hs = gru_scan(x_proj, rec_kernel, rec_bias, h0,
                          unroll=self.unroll)
            h_last = hs[-1]
        else:
            def step(h, xt):
                rec = _mm(h, rec_kernel) + rec_bias
                xz, xr, xh = xt[:, :u], xt[:, u:2 * u], xt[:, 2 * u:]
                rz, rr, rh = rec[:, :u], rec[:, u:2 * u], rec[:, 2 * u:]
                z = jax.nn.sigmoid(xz + rz)
                r = jax.nn.sigmoid(xr + rr)
                hh = jnp.tanh(xh + r * rh)
                h_new = z * h + (1.0 - z) * hh
                return h_new, h_new

            h_last, hs = jax.lax.scan(step, h0, x_proj,
                                      unroll=self.unroll)
        out = jnp.swapaxes(hs, 0, 1) if self.return_sequences else h_last
        if return_state:
            return out, h_last
        return out


class Fc(Sequential):
    """ddsp nn.Fc: Dense -> Keras LayerNorm -> LeakyReLU."""

    def __init__(self, ch: int, in_features: int,
                 nonlinearity='leaky_relu', name: Optional[str] = None):
        super().__init__([
            Dense(ch, in_features),
            LayerNormalization(ch),
            Activation(nonlinearity),
        ], name=name)
        self.ch = ch


class FcStack(Sequential):
    """ddsp nn.FcStack: `layers` stacked Fc blocks."""

    def __init__(self, ch: int, in_features: int, layers: int = 2,
                 nonlinearity='leaky_relu', name: Optional[str] = None):
        blocks = []
        d = in_features
        for _ in range(layers):
            blocks.append(Fc(ch, d, nonlinearity))
            d = ch
        super().__init__(blocks, name=name)
        self.ch = ch


def split_to_dict(tensor: Array,
                  tensor_splits: Sequence[Tuple[str, int]]) -> dict:
    """Split the last axis into named chunks (ddsp nn.split_to_dict)."""
    labels = [v[0] for v in tensor_splits]
    sizes = [v[1] for v in tensor_splits]
    tensors = jnp.split(tensor, np_cumsum_exclusive(sizes), axis=-1)
    return dict(zip(labels, tensors))


def np_cumsum_exclusive(sizes):
    out, acc = [], 0
    for s in sizes[:-1]:
        acc += s
        out.append(acc)
    return out
