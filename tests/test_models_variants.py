"""Ablation encoder variants: fc/transformer/crnn family, DPIPD, utils."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.models.encoder import EmbedEncoder
from sarssl_tpu.ops.dpipd import dpipd_template, dpipd_for_doa
from sarssl_tpu.utils.metrics import (estimate_flops, forgetting_norm,
                                      cross_validation_datadirs)

SIG = (16, 8, 2, 2)  # (nf, nt, nreim, nmic)
PATCH = (16, 1)


def _embed_input(nb=2):
    rng = np.random.default_rng(0)
    npatch, dpatch = 8, 16
    return jnp.asarray(rng.standard_normal((nb, npatch, dpatch * 4))
                       .astype(np.float32))


@pytest.mark.parametrize("model", [("fc", "conformer"), ("fc", "transformer"),
                                   ("cnn", "transformer"), ("crnn",),
                                   ("crnn-sim",), ("tcrnn",)])
def test_encoder_variants(model):
    x = _embed_input()
    enc = EmbedEncoder(sig_shape=SIG, patch_shape=PATCH, dembed=16,
                       model=model, mode="spat")
    v = enc.init({"params": jax.random.key(0)}, x, False)
    out = enc.apply(v, x, False)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_dpipd_template_properties():
    mic = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    tpl, (ele, azi) = dpipd_template(mic, ndoa_candidate=(5, 9), nf=17,
                                     fre_max=8000.0)
    assert tpl.shape == (5, 9, 17, 1)
    np.testing.assert_allclose(np.abs(np.asarray(tpl)), 1.0, atol=1e-5)
    # DC bin: zero phase for all directions
    np.testing.assert_allclose(np.asarray(tpl[:, :, 0]).imag, 0.0, atol=1e-6)


def test_dpipd_for_doa_endfire():
    """End-fire source: IPD phase = 2*pi*f*d/c at the second mic."""
    mic = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    doa = jnp.asarray(np.array([[[[np.pi / 2], [0.0]]]]))  # (1,1,2,1) ele=90,azi=0
    dp = dpipd_for_doa(doa, mic, nf=9, fre_max=8000.0)
    assert dp.shape == (1, 1, 9, 1, 1)
    phase = np.angle(np.asarray(dp[0, 0, :, 0, 0]))
    f = np.linspace(0, 8000, 9)
    # pair (mic0, mic1): phase = 2*pi*f*(r . (mic0 - mic1))/c = -2*pi*f*d/c
    expected = -2 * np.pi * f * 0.1 / 343.0
    wrapped = np.angle(np.exp(1j * expected))
    np.testing.assert_allclose(phase, wrapped, atol=1e-3)


def test_estimate_flops_matmul():
    a = jnp.zeros((64, 64))
    g = estimate_flops(lambda x: x @ x, a)
    assert g == pytest.approx(2 * 64 ** 3 / 1e9, rel=0.5)


def test_forgetting_norm_converges_to_mean():
    # reference semantics (common/utils.py:142-172): (B,C,F,T) in,
    # (B,1,1,T) per-frame normalizer out, converging to the running mean
    x = jnp.ones((4, 2, 3, 100)) * 3.0
    out = forgetting_norm(x, num_frame_set=10)
    assert out.shape == (4, 1, 1, 100)
    assert float(out[0, 0, 0, -1]) == pytest.approx(3.0, rel=0.01)
    # warm-up: the first frame's alpha is (0-1)/(0+1) = -1 -> mu_0 = 2*m_0
    assert float(out[0, 0, 0, 0]) == pytest.approx(6.0, rel=0.01)


def test_cross_validation_splits():
    splits = list(cross_validation_datadirs(["r1", "r2", "r3"]))
    assert len(splits) == 3
    assert splits[0]["test"] == ["r1"] and "r1" not in splits[0]["train"]

    # with_val: disjoint train/val/test covering all rooms, deterministic
    sv = list(cross_validation_datadirs(["r1", "r2", "r3", "r4"],
                                        with_val=True, seed=5))
    assert len(sv) == 4
    for s in sv:
        assert len(s["val"]) == 1 and len(s["test"]) == 1
        all_rooms = s["train"] + s["val"] + s["test"]
        assert sorted(all_rooms) == ["r1", "r2", "r3", "r4"]
        assert not set(s["train"]) & set(s["val"]) | set(s["val"]) & set(s["test"])
    sv2 = list(cross_validation_datadirs(["r1", "r2", "r3", "r4"],
                                         with_val=True, seed=5))
    assert sv == sv2  # process-stable


def test_caucrnn_causal_and_shapes():
    """CauCRNN (reference CRNN.py:301-356): output shape and causality —
    changing a late frame must not affect earlier outputs."""
    import numpy as np
    from sarssl_tpu.models.crnn import CauCRNN

    net = CauCRNN(conv_chs=16, rnn_hid=32, out_dim=24)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 64, 24, 4)).astype(np.float32))
    v = net.init({"params": jax.random.key(0)}, x, False)
    y = net.apply(v, x, False)
    assert y.shape == (1, 2, 24)  # nt 24/(2*2*3)=2 pooled frames
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) <= net.max_num_sources + 1e-6
    # causality: perturb the last raw frame; the first pooled frame (covering
    # frames 0..11) must be unchanged
    x2 = x.at[:, :, -1, :].add(10.0)
    y2 = net.apply(v, x2, False)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(y2[:, 0]),
                               atol=1e-6)


def test_decoder_cnn_head_shapes():
    """EmbedDecoder dec_model=('','cnn') (reference model.py:302-343)."""
    import numpy as np
    from sarssl_tpu.models.decoder import EmbedDecoder

    sig_shape = (32, 8, 2, 2)
    dec = EmbedDecoder(sig_shape=sig_shape, patch_shape=(32, 1), dembed=64,
                       model=("", "cnn"))
    embed = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, 8, 64)).astype(np.float32))
    v = dec.init({"params": jax.random.key(0)}, embed, False)
    y = dec.apply(v, embed, False)
    assert y.shape == (2, 8, 32 * 2 * 2)
    assert np.isfinite(np.asarray(y)).all()
