"""Functional neural-network layers with Keras-compatible numerics."""

from ddsp_piano_tpu.nn.module import (  # noqa: F401
    DictModule,
    Module,
    Params,
    Sequential,
    split_keys,
)
from ddsp_piano_tpu.nn.layers import (  # noqa: F401
    Activation,
    Dense,
    Embedding,
    Fc,
    FcStack,
    GRU,
    LayerNormalization,
    Normalize,
    glorot_uniform,
    leaky_relu,
    orthogonal,
    split_to_dict,
)
