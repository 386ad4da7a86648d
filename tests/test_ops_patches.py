"""Patch split/recover: inverse property and parity with torch F.unfold order."""
import numpy as np
import pytest

import jax.numpy as jnp

from sarssl_tpu.ops import patch_split, patch_recover


@pytest.mark.parametrize("patch,f_first", [((8, 1), False), ((2, 4), False), ((2, 4), True)])
def test_roundtrip_5d(patch, f_first):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 8, 2, 2)).astype(np.float32)
    v = patch_split(jnp.asarray(x), patch, f_first)
    pf, pt = patch
    assert v.shape == (2, (16 // pf) * (8 // pt), pf * pt, 2, 2)
    y = patch_recover(v, (16, 8), patch, f_first)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_matches_torch_unfold_order():
    """dpatch/npatch orderings must match F.unfold(kernel=stride) semantics
    used by the reference PatchSplit (utils_module.py:196-207)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    nf, nt, nreim, nmic = 8, 6, 2, 2
    patch = (4, 2)
    x = rng.standard_normal((3, nf, nt, nreim, nmic)).astype(np.float32)

    ours = np.asarray(patch_split(jnp.asarray(x), patch))

    t = torch.from_numpy(x)
    d = t.permute(0, 3, 4, 1, 2).reshape(3, nreim * nmic, nf, nt)
    vec = F.unfold(d, kernel_size=patch, stride=patch)
    vec = vec.reshape(3, nreim, nmic, patch[0] * patch[1], vec.shape[-1])
    ref = vec.permute(0, 4, 3, 1, 2).numpy()

    np.testing.assert_allclose(ours, ref, atol=0)


def test_frame_patch_is_transpose():
    """patch (nf,1) turns TF maps into per-frame vectors: npatch==nt, dpatch==nf."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 5, 2, 2)).astype(np.float32)
    v = np.asarray(patch_split(jnp.asarray(x), (8, 1)))
    assert v.shape == (1, 5, 8, 2, 2)
    np.testing.assert_array_equal(v[0, 3, :, 1, 0], x[0, :, 3, 1, 0])
