"""Fused attention kernel vs jnp reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.kernels.attention import fused_attention, reference_attention

B, H, L, D = 2, 2, 32, 16
SCALE = 0.125


def _inputs(seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    qu = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    bias = jax.random.normal(ks[3], (B, H, L, L), jnp.float32)
    return qu, k, v, bias


def test_forward_matches_reference():
    qu, k, v, bias = _inputs()
    out = fused_attention(qu, k, v, bias, SCALE, True)
    ref = reference_attention(qu, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_reference():
    qu, k, v, bias = _inputs(1)

    def loss_fused(args):
        return jnp.sum(fused_attention(*args, SCALE, True) ** 2)

    def loss_ref(args):
        return jnp.sum(reference_attention(*args, SCALE) ** 2)

    gf = jax.grad(loss_fused)((qu, k, v, bias))
    gr = jax.grad(loss_ref)((qu, k, v, bias))
    for a, b, name in zip(gf, gr, ["dqu", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3, err_msg=name)
