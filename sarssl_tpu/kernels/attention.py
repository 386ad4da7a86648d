"""Pallas fused attention for the conformer's rel-pos MHSA.

For the 256-patch sequences this model uses, a whole (L, L) score matrix fits
in VMEM, so one kernel instance per (batch, head) computes

    s = (qu @ k^T + bias) * scale ;  p = softmax(s) ;  out = p @ v

without ever writing scores or probabilities to HBM. The backward pass
recomputes them (flash-attention style) and returns (dqu, dk, dv, dbias).

Interface notes:
  * ``qu`` is q + u_bias and ``bias`` is the relative-shifted positional
    score (q+v) P^T — both computed in XLA, so their own gradients (to the
    projections and u/v biases) flow automatically through the chain rule;
  * attention dropout is not fused; use this kernel with attention_dropout=0
    (eval, or training configs without attention dropout).

Enabled via SARSSLConfig(fused_attention=True); off by default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(qu_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    qu = qu_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = (jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
         + bias_ref[0, 0].astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    out_ref[0, 0] = jnp.dot(p.astype(qu.dtype), v,
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _bwd_kernel(qu_ref, k_ref, v_ref, bias_ref, g_ref,
                dqu_ref, dk_ref, dv_ref, dbias_ref, *, scale: float):
    qu = qu_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    s = (jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
         + bias_ref[0, 0].astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    pf = p
    dv_ref[0, 0] = jnp.dot(pf.T.astype(g.dtype), g,
                           preferred_element_type=jnp.float32
                           ).astype(dv_ref.dtype)
    dp = jnp.dot(gf, v.astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    dbias_ref[0, 0] = (ds * scale).astype(dbias_ref.dtype)
    dsx = (ds * scale).astype(qu.dtype)
    dqu_ref[0, 0] = jnp.dot(dsx, k, preferred_element_type=jnp.float32
                            ).astype(dqu_ref.dtype)
    dk_ref[0, 0] = jnp.dot(dsx.T, qu, preferred_element_type=jnp.float32
                           ).astype(dk_ref.dtype)


def _specs(B, H, L, D):
    blk = lambda *shape: pl.BlockSpec((1, 1) + shape,
                                      lambda b, h: (b, h) + (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return dict(qkv=blk(L, D), score=blk(L, L))


def _call_fwd(qu, k, v, bias, scale, interpret):
    B, H, L, D = qu.shape
    sp = _specs(B, H, L, D)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qu.shape, qu.dtype),
        grid=(B, H),
        in_specs=[sp["qkv"], sp["qkv"], sp["qkv"], sp["score"]],
        out_specs=sp["qkv"],
        interpret=interpret,
    )(qu, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(qu, k, v, bias, scale: float, interpret: bool = False):
    """out (B,H,L,D) = softmax((qu k^T + bias) * scale) v, fused per (b,h)."""
    return _call_fwd(qu, k, v, bias, scale, interpret)


def _fa_fwd(qu, k, v, bias, scale, interpret):
    return _call_fwd(qu, k, v, bias, scale, interpret), (qu, k, v, bias)


def _fa_bwd(scale, interpret, res, g):
    qu, k, v, bias = res
    B, H, L, D = qu.shape
    sp = _specs(B, H, L, D)
    dqu, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qu.shape, qu.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(bias.shape, bias.dtype)),
        grid=(B, H),
        in_specs=[sp["qkv"], sp["qkv"], sp["qkv"], sp["score"], sp["qkv"]],
        out_specs=(sp["qkv"], sp["qkv"], sp["qkv"], sp["score"]),
        interpret=interpret,
    )(qu, k, v, bias, g)
    return dqu, dk, dv, dbias


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def reference_attention(qu, k, v, bias, scale: float):
    """jnp reference used for kernel validation."""
    s = (jnp.einsum("bhid,bhjd->bhij", qu.astype(jnp.float32),
                    k.astype(jnp.float32)) + bias.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p,
                      v.astype(jnp.float32)).astype(qu.dtype)
