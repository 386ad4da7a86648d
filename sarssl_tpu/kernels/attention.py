"""Pallas fused attention for the conformer's rel-pos MHSA.

For the 256-patch sequences this model uses, a whole (L, L) score matrix fits
in VMEM, so one kernel instance per (batch, head) computes

    s = (qu @ k^T + bias) * scale ;  p = softmax(s) ;
    p = dropout(p)                  (hardware PRNG, optional) ;
    out = p @ v

without ever writing scores or probabilities to HBM. The backward pass
recomputes everything — including the identical dropout mask from the saved
seed — and returns (dqu, dk, dv, dbias).

Interface notes:
  * ``qu`` is q + u_bias and ``bias`` is the relative-shifted positional
    score (q+v) P^T — both computed in XLA, so their own gradients (to the
    projections and u/v biases) flow automatically through the chain rule;
  * attention dropout uses ``pltpu.prng_random_bits`` seeded per (batch,
    head) from a scalar seed, exactly like kernels/dropout.py.

Enabled via SARSSLConfig(fused_attention=True); measured on v5e: full train
step 182 -> 163 ms vs the XLA attention at the same config.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend(qu, k, v, bias, seed, scale: float, rate: float, b, h, nh):
    """Returns (p_pre_dropout, p_post_dropout), both f32 (L, L)."""
    s = (jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
         + bias.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        pltpu.prng_seed(seed + (b * nh + h) * 1000003)
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = np.uint32(min(max(rate, 0.0), 0.9999999) * 4294967296.0)
        pdrop = jnp.where(bits >= thresh, p / (1.0 - rate), 0.0)
    else:
        pdrop = p
    return p, pdrop


def _fwd_kernel(seed_ref, qu_ref, k_ref, v_ref, bias_ref, out_ref,
                *, scale: float, rate: float, nh: int):
    b, h = pl.program_id(0), pl.program_id(1)
    qu = qu_ref[0, 0]
    _, p = _attend(qu, k_ref[0, 0], v_ref[0, 0], bias_ref[0, 0],
                   seed_ref[0], scale, rate, b, h, nh)
    out_ref[0, 0] = jnp.dot(p.astype(qu.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, qu_ref, k_ref, v_ref, bias_ref, g_ref,
                dqu_ref, dk_ref, dv_ref, dbias_ref,
                *, scale: float, rate: float, nh: int):
    b, h = pl.program_id(0), pl.program_id(1)
    qu = qu_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    p, pdrop = _attend(qu, k, v, bias_ref[0, 0], seed_ref[0],
                       scale, rate, b, h, nh)
    gf = g.astype(jnp.float32)
    dv_ref[0, 0] = jnp.dot(pdrop.T.astype(g.dtype), g,
                           preferred_element_type=jnp.float32
                           ).astype(dv_ref.dtype)
    dpdrop = jnp.dot(gf, v.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
    if rate > 0.0:
        # dropout backward: same mask/scale as forward
        dp = jnp.where(pdrop != 0.0, dpdrop / (1.0 - rate), 0.0)
        # note: where p>0 everywhere (softmax), pdrop==0 iff dropped
    else:
        dp = dpdrop
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dbias_ref[0, 0] = (ds * scale).astype(dbias_ref.dtype)
    dsx = (ds * scale).astype(qu.dtype)
    dqu_ref[0, 0] = jnp.dot(dsx, k, preferred_element_type=jnp.float32
                            ).astype(dqu_ref.dtype)
    dk_ref[0, 0] = jnp.dot(dsx.T, qu, preferred_element_type=jnp.float32
                           ).astype(dk_ref.dtype)


def _specs(L, D):
    blk = lambda *shape: pl.BlockSpec((1, 1) + shape,
                                      lambda b, h: (b, h) + (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return dict(qkv=blk(L, D), score=blk(L, L),
                seed=pl.BlockSpec(memory_space=pltpu.SMEM))


def _call_fwd(qu, k, v, bias, seed, scale, rate, interpret):
    B, H, L, D = qu.shape
    sp = _specs(L, D)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, nh=H),
        out_shape=jax.ShapeDtypeStruct(qu.shape, qu.dtype),
        grid=(B, H),
        in_specs=[sp["seed"], sp["qkv"], sp["qkv"], sp["qkv"], sp["score"]],
        out_specs=sp["qkv"],
        interpret=interpret,
    )(seed, qu, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention(qu, k, v, bias, seed, scale: float, rate: float = 0.0,
                    interpret: bool = False):
    """out (B,H,L,D) = dropout(softmax((qu k^T + bias) * scale)) v, fused.

    seed: int32 array (1,) — attention-dropout seed (ignored when rate=0).
    """
    return _call_fwd(qu, k, v, bias, seed, scale, rate, interpret)


def _fa_fwd(qu, k, v, bias, seed, scale, rate, interpret):
    out = _call_fwd(qu, k, v, bias, seed, scale, rate, interpret)
    return out, (qu, k, v, bias, seed)


def _fa_bwd(scale, rate, interpret, res, g):
    qu, k, v, bias, seed = res
    B, H, L, D = qu.shape
    sp = _specs(L, D)
    dqu, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, nh=H),
        out_shape=(jax.ShapeDtypeStruct(qu.shape, qu.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(bias.shape, bias.dtype)),
        grid=(B, H),
        in_specs=[sp["seed"], sp["qkv"], sp["qkv"], sp["qkv"], sp["score"],
                  sp["qkv"]],
        out_specs=(sp["qkv"], sp["qkv"], sp["qkv"], sp["score"]),
        interpret=interpret,
    )(seed, qu, k, v, bias, g)
    return dqu, dk, dv, dbias, None


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def reference_attention(qu, k, v, bias, scale: float):
    """jnp reference (no dropout) used for kernel validation."""
    s = (jnp.einsum("bhid,bhjd->bhij", qu.astype(jnp.float32),
                    k.astype(jnp.float32)) + bias.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p,
                      v.astype(jnp.float32)).astype(qu.dtype)
