"""Conformer encoder (flax.linen), TPU-first.

Functionally equivalent to the reference stack
(/root/reference/code/common/Conformer.py:16-195 and
/root/reference/code/common/conformer/*): macaron half-step feed-forwards,
Transformer-XL-style relative multi-head self-attention with learned u/v
biases, a GLU + depthwise-conv module with BatchNorm, and a closing
LayerNorm per block.

TPU-first choices:
  * all matmuls carry ``preferred_element_type=float32`` accumulators and a
    configurable compute ``dtype`` (bf16 by default in training) so they land
    on the MXU;
  * the positional term ``(q+v) P^T`` is computed once per layer from a
    static sinusoid table (positions ``0..L-1``, exactly the slice the
    reference feeds, conformer/embedding.py:31-46 + attention.py:87-113)
    followed by the relative left-shift;
  * depthwise conv uses ``feature_group_count`` so XLA emits one fused
    convolution; no Python loops anywhere.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Dropout


def sinusoid_position_encoding(length: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """PE(pos, 2i) = sin(pos/10000^(2i/d)), PE(pos, 2i+1) = cos(...)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    ang = pos * div[None, :]
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe.astype(dtype)


def _relative_shift(pos_score: jax.Array) -> jax.Array:
    """Transformer-XL left-shift trick (attention.py:105-113)."""
    b, h, l1, l2 = pos_score.shape
    zeros = jnp.zeros((b, h, l1, 1), pos_score.dtype)
    padded = jnp.concatenate([zeros, pos_score], axis=-1)
    padded = padded.reshape(b, h, l2 + 1, l1)
    return padded[:, :, 1:].reshape(b, h, l1, l2)


class RelPosSelfAttention(nn.Module):
    """Relative multi-head self-attention (Transformer-XL content/pos split).

    With ``fused=True`` and no active attention dropout, the content matmul,
    bias add, softmax and PV product run as one Pallas kernel per (batch,
    head) — scores/probabilities never touch HBM (kernels/attention.py)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        nb, nseq, _ = x.shape
        dh = self.d_model // self.num_heads
        dense = lambda name, bias=True: nn.Dense(
            self.d_model, use_bias=bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name)

        q = dense("query")(x).reshape(nb, nseq, self.num_heads, dh)
        k = dense("key")(x).reshape(nb, nseq, self.num_heads, dh)
        v = dense("value")(x).reshape(nb, nseq, self.num_heads, dh)

        pe = sinusoid_position_encoding(nseq, self.d_model, self.dtype)
        p = dense("pos", bias=False)(pe).reshape(nseq, self.num_heads, dh)

        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(), (self.num_heads, dh))
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(), (self.num_heads, dh))

        # pos bias: (b,h,i,j) = (q+v) . p_j, relative-shifted
        pos = jnp.einsum("bihd,jhd->bhij", q + v_bias.astype(self.dtype), p,
                         preferred_element_type=jnp.float32)
        # reference scales by sqrt(d_model), not sqrt(d_head) (attention.py:58,91)
        scale = 1.0 / math.sqrt(self.d_model)

        drop_active = (not deterministic) and self.dropout > 0.0
        use_fused = self.fused and jax.default_backend() == "tpu"
        # the fused kernel consumes pos at compute dtype; casting BEFORE the
        # relative shift is bitwise identical (the shift is pure data
        # movement) and halves the shift's HBM passes on the (b,h,l,l) bias.
        pos = _relative_shift(pos.astype(self.dtype) if use_fused else pos)
        if use_fused:
            from ..kernels.attention import fused_attention

            if drop_active:
                seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                          2 ** 31 - 1, dtype=jnp.int32)
                rate = float(self.dropout)
            else:
                seed = jnp.zeros((1,), jnp.int32)
                rate = 0.0
            qu = jnp.transpose(q + u_bias.astype(self.dtype), (0, 2, 1, 3))
            kt = jnp.transpose(k, (0, 2, 1, 3))
            vt = jnp.transpose(v, (0, 2, 1, 3))
            ctx = fused_attention(qu, kt, vt, pos, seed, scale, rate)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3))
        else:
            content = jnp.einsum("bihd,bjhd->bhij",
                                 q + u_bias.astype(self.dtype), k,
                                 preferred_element_type=jnp.float32)
            score = (content + pos) * scale
            attn = jax.nn.softmax(score.astype(jnp.float32),
                                  axis=-1).astype(self.dtype)
            attn = Dropout(self.dropout)(attn, deterministic=deterministic)
            ctx = jnp.einsum("bhij,bjhd->bihd", attn, v,
                             preferred_element_type=jnp.float32)
        ctx = ctx.astype(self.dtype).reshape(nb, nseq, self.d_model)
        return dense("out")(ctx)


class FeedForwardModule(nn.Module):
    """LN -> Dense(4d) -> swish -> dropout -> Dense(d) -> dropout."""

    dim: int
    expansion: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.dim * self.expansion, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(y)
        y = nn.swish(y)
        y = Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(y)
        return Dropout(self.dropout)(y, deterministic=deterministic)


class ConvModule(nn.Module):
    """LN -> pointwise(2d) -> GLU -> depthwise(k) -> BN -> swish -> pointwise -> dropout."""

    dim: int
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(2 * self.dim, dtype=self.dtype)(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)  # GLU over channels
        y = nn.Conv(self.dim, kernel_size=(self.kernel_size,),
                    feature_group_count=self.dim, padding="SAME",
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=0.9, epsilon=1e-5)(y)
        y = nn.swish(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return Dropout(self.dropout)(y, deterministic=not train)


class ConformerBlock(nn.Module):
    dim: int
    num_heads: int = 4
    ff_expansion: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = x + 0.5 * FeedForwardModule(self.dim, self.ff_expansion, self.dropout,
                                        self.dtype, name="ff1")(x, det)
        attn_in = nn.LayerNorm(dtype=self.dtype, name="mhsa_ln")(x)
        attn = RelPosSelfAttention(self.dim, self.num_heads, self.dropout,
                                   self.fused_attention, self.dtype,
                                   name="mhsa")(attn_in, det)
        x = x + Dropout(self.dropout)(attn, deterministic=det)
        x = x + ConvModule(self.dim, self.conv_kernel_size, self.dropout,
                           self.dtype, name="conv")(x, train)
        x = x + 0.5 * FeedForwardModule(self.dim, self.ff_expansion, self.dropout,
                                        self.dtype, name="ff2")(x, det)
        return nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)


class ConformerEncoder(nn.Module):
    """N conformer blocks; optional mean-broadcast residual (Conformer.py:190-193)."""

    dim: int
    num_layers: int
    num_heads: int = 4
    ff_expansion: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    add_same_one: bool = False
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = (nn.remat(ConformerBlock, static_argnums=(2,))
                     if self.remat else ConformerBlock)
        for i in range(self.num_layers):
            x = block_cls(self.dim, self.num_heads, self.ff_expansion,
                          self.conv_kernel_size, self.dropout,
                          self.fused_attention, self.dtype,
                          name=f"block{i}")(x, train)
            if self.add_same_one:
                x = x + jnp.mean(x, axis=1, keepdims=True)
        return x
