"""Pre-LN Transformer encoder (ablation architecture).

Behavioral equivalent of the reference TransformerEncoder
(/root/reference/code/common/Transformer.py:147-166): sinusoidal (or
trainable) absolute positional encoding with sqrt(d_model) input scaling,
pre-norm residual attention + FF layers, final LayerNorm.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from .common import Dropout

from .conformer import sinusoid_position_encoding


class EncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic)(y, y)
        x = x + Dropout(self.dropout)(attn, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        y = nn.Dense(self.d_ff, dtype=self.dtype)(y)
        y = Dropout(self.dropout)(nn.relu(y), deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        return x + Dropout(self.dropout)(y, deterministic=deterministic)


class TransformerEncoder(nn.Module):
    d_model: int
    num_layers: int
    num_heads: int = 4
    d_ff: int = 0  # 0 -> 4*d_model
    dropout: float = 0.1
    add_same_one: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        nseq = x.shape[1]
        pe = sinusoid_position_encoding(nseq, self.d_model, self.dtype)
        x = x * math.sqrt(self.d_model) + pe[None]
        x = Dropout(self.dropout)(x, deterministic=det)
        d_ff = self.d_ff or 4 * self.d_model
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, d_ff, self.num_heads,
                             self.dropout, self.dtype, name=f"layer{i}")(x, det)
            if self.add_same_one:
                x = x + jnp.mean(x, axis=1, keepdims=True)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
