"""Mask statistics and mic-pair rebatching."""
import numpy as np

import jax
import jax.numpy as jnp

from sarssl_tpu.ops import gen_patch_mask, mic_pair_rebatch
from sarssl_tpu.ops.mask import T1S_MODE


def test_mask_counts_exact():
    m = gen_patch_mask(jax.random.key(0), nbatch=16, npatch=256, nmasked=128)
    patch = np.asarray(m.patch)
    assert patch.shape == (16, 256)
    np.testing.assert_array_equal(patch.sum(axis=1), 128)
    idx = np.asarray(m.idx)
    assert idx.shape == (16, 128)
    for b in range(16):
        assert len(set(idx[b].tolist())) == 128
        np.testing.assert_array_equal(np.sort(np.nonzero(patch[b])[0]), np.sort(idx[b]))


def test_mask_uniform_coverage():
    keys = jax.random.split(jax.random.key(1), 64)
    counts = np.zeros(32)
    chs = []
    for k in keys:
        m = gen_patch_mask(k, nbatch=8, npatch=32, nmasked=16)
        counts += np.asarray(m.patch).sum(axis=0)
        chs.append(np.asarray(m.ch))
    frac = counts / (64 * 8)
    # each patch masked ~50% of the time
    assert abs(frac.mean() - 0.5) < 1e-6
    assert frac.std() < 0.08
    ch = np.concatenate(chs)
    assert 0.4 < ch.mean() < 0.6  # channels 0/1 equally likely


def test_mask_t1s_static_block():
    m = gen_patch_mask(jax.random.key(0), 4, 256, 64, mode=T1S_MODE)
    patch = np.asarray(m.patch)
    np.testing.assert_array_equal(patch[:, :192], False)
    np.testing.assert_array_equal(patch[:, 192:], True)


def test_pair_rebatch_m_mode():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 3, 5)).astype(np.float32)
    out = np.asarray(mic_pair_rebatch(jnp.asarray(x), "M"))
    assert out.shape == (6, 2, 3, 5)
    # item b*(nch-1)+i pairs (ch0, ch_{i+1}) of batch b
    for b in range(2):
        for i in range(3):
            np.testing.assert_array_equal(out[b * 3 + i, 0], x[b, 0])
            np.testing.assert_array_equal(out[b * 3 + i, 1], x[b, i + 1])


def test_pair_rebatch_mm_mode():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 2)).astype(np.float32)
    out = np.asarray(mic_pair_rebatch(jnp.asarray(x), "MM"))
    assert out.shape == (6, 2, 2)
    expected = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for k, (i, j) in enumerate(expected):
        np.testing.assert_array_equal(out[k, 0], x[0, i])
        np.testing.assert_array_equal(out[k, 1], x[0, j])


def test_pair_rebatch_2ch_identity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2, 4)).astype(np.float32)
    out = np.asarray(mic_pair_rebatch(jnp.asarray(x), "M"))
    np.testing.assert_array_equal(out, x)
