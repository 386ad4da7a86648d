"""Pallas dropout kernel: fallback-path semantics on CPU; the TPU path is
exercised by scripts/profile_dropout.py on hardware."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.kernels import tpu_dropout


def test_dropout_deterministic_passthrough():
    x = jnp.ones((4, 8))
    out = tpu_dropout(x, jax.random.key(0), 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out0 = tpu_dropout(x, jax.random.key(0), 0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


def test_dropout_statistics_and_scaling():
    x = jnp.ones((512, 512))
    out = np.asarray(tpu_dropout(x, jax.random.key(1), 0.3))
    zero_frac = (out == 0).mean()
    assert zero_frac == pytest.approx(0.3, abs=0.02)
    nz = out[out != 0]
    np.testing.assert_allclose(nz, 1.0 / 0.7, rtol=1e-5)
    assert out.mean() == pytest.approx(1.0, abs=0.02)  # inverted dropout


def test_dropout_grad_matches_mask():
    x = jnp.ones((64, 64))
    key = jax.random.key(2)

    def f(x):
        return jnp.sum(tpu_dropout(x, key, 0.5) * 2.0)

    g = np.asarray(jax.grad(f)(x))
    out = np.asarray(tpu_dropout(x, key, 0.5))
    # gradient is 2/keep_prob exactly where the forward kept the value
    np.testing.assert_allclose(g, (out != 0) * 2.0 / 0.5, rtol=1e-5)


def test_conv_s2d_interpret_matches_xla_fwd_and_grads():
    """The experimental s2d Pallas conv (kernels/conv_s2d.py) verified on
    CPU via interpret mode: forward and both VJPs against
    lax.conv_general_dilated at an aligned shape."""
    from sarssl_tpu.kernels.conv_s2d import conv3x3_s2d, supports_s2d

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 16, 4
    assert supports_s2d((B, H, W, C))
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = conv3x3_s2d(x, w, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w)),
                               rtol=1e-5, atol=1e-5)

    dy = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    loss = lambda f: lambda x, w: jnp.sum(f(x, w) * dy)
    gx, gw = jax.grad(loss(lambda x, w: conv3x3_s2d(x, w, 8, True)),
                      argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_dropout_inside_model_training_still_learns():
    """End-to-end sanity: the swapped Dropout module trains as before."""
    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import FeatureConfig
    from sarssl_tpu.train import create_train_state, make_pretrain_step
    from sarssl_tpu.ops import gen_patch_mask
    from sarssl_tpu.data import synth_batch

    from tiny import NSAMPLE, FEAT, CFG as cfg
    model = SARSSL(cfg)
    x0 = jnp.zeros((8, 2, 64, 8, 2))
    m0 = gen_patch_mask(jax.random.key(0), 8, cfg.npatch, cfg.effective_nmasked())
    state = create_train_state(model, jax.random.key(1), x0, m0)
    step = make_pretrain_step(model, FEAT, donate=False)
    wave = jnp.asarray(synth_batch(np.random.default_rng(0), 8, NSAMPLE)[0])
    losses = []
    key = jax.random.key(3)
    for i in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, wave, 1e-3, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
