"""in_ver variants, CLS token, and the new mask modes inside the model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import gen_patch_mask
from sarssl_tpu.ops.mask import TF_MODE, TCLUSTER_INV_MODE, TCLUSTER2_MODE


def _x(nb=2, cfg=None):
    nf, nt, nreim, nmic = cfg.sig_shape
    return jnp.asarray(np.random.default_rng(0)
                       .standard_normal((nb, nmic, nf, nt, nreim))
                       .astype(np.float32))


@pytest.mark.parametrize("in_ver", ["separate", "same", "single_ch_each_patch"])
def test_pretext_in_ver_variants(in_ver):
    cfg = SARSSLConfig(in_ver=in_ver).tiny()
    model = SARSSL(cfg)
    x = _x(cfg=cfg)
    mask = gen_patch_mask(jax.random.key(0), 2, cfg.npatch,
                          cfg.effective_nmasked())
    v = model.init({"params": jax.random.key(1)}, x, mask, False)
    loss, diff, aux = model.apply(v, x, mask, False)
    assert np.isfinite(float(loss)) and np.isfinite(float(diff))
    assert aux["pred"].shape == (2, cfg.npatch, cfg.dpatch, 2, 2)


@pytest.mark.parametrize("token", ["all", "cls"])
def test_cls_token_downstream(token):
    cfg = SARSSLConfig(use_cls=True, downstream_token=token,
                       pretrain=False).tiny(pretrain=False, use_cls=True)
    model = SARSSL(cfg)
    x = _x(cfg=cfg)
    v = model.init({"params": jax.random.key(0)}, x, None, False)
    pred, emb = model.apply(v, x, None, False)
    assert pred.shape == (2, 1)
    assert emb.shape == (2, cfg.spec_dembed + cfg.spat_dembed)
    # CLS param exists in both encoders
    assert "cls_token" in v["params"]["spec_encoder"]


@pytest.mark.parametrize("mode,kw", [
    (TCLUSTER_INV_MODE, {}), (TCLUSTER2_MODE, {}),
    (TF_MODE, {"grid_shape": (4, 4)}),
])
def test_new_mask_modes_exact_counts(mode, kw):
    m = gen_patch_mask(jax.random.key(3), 8, 16, 8, mode=mode, **kw)
    p = np.asarray(m.patch)
    np.testing.assert_array_equal(p.sum(axis=1), 8)
    idx = np.asarray(m.idx)
    for b in range(8):
        np.testing.assert_array_equal(np.sort(np.nonzero(p[b])[0]), idx[b])


def test_tf_mode_blocks_are_2d():
    """TF blocks on a (gh, gw) grid produce spatially clustered masks."""
    m = gen_patch_mask(jax.random.key(0), 32, 256, 64, mode=TF_MODE,
                       grid_shape=(16, 16))
    p = np.asarray(m.patch).reshape(32, 16, 16)
    # a 2-D clustered mask has fewer isolated cells than a uniform draw:
    # measure mean number of masked 4-neighbors of masked cells
    nb_count, tot = 0.0, 0
    for b in range(32):
        g = p[b]
        ii, jj = np.nonzero(g)
        for i, j in zip(ii, jj):
            n = 0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                if 0 <= i + di < 16 and 0 <= j + dj < 16 and g[i + di, j + dj]:
                    n += 1
            nb_count += n
            tot += 1
    mean_neighbors = nb_count / tot
    assert mean_neighbors > 1.0, mean_neighbors  # uniform draws give ~1.0
