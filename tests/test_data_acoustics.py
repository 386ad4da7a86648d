"""Acoustics engine: sampler validity, ISM physics, noise coherence,
annotation math, native/numpy parity, end-to-end scene synthesis."""
import numpy as np
import pytest

from sarssl_tpu.data.rooms import (AcousticSamplerConfig, beta_sabine,
                                   sabine_t60, sample_acoustic_scene)
from sarssl_tpu.data import ism, native
from sarssl_tpu.data.noise import (diffuse_noise, measured_coherence,
                                   add_noise, desired_spatial_coherence)
from sarssl_tpu.data.annotations import (tdoa_from_geometry, t60_from_rir,
                                         drr, c50, mean_absorption)
from sarssl_tpu.data.scene import SceneSynthesizer

FS = 16000
CFG = AcousticSamplerConfig(
    room_sz_range=((4.0, 6.0), (4.0, 6.0), (2.5, 3.0)),
    T60_range=(0.3, 0.5),
)


def test_beta_sabine_inverts():
    room = [5.0, 4.0, 3.0]
    for t60 in (0.3, 0.6, 1.0):
        beta = beta_sabine(room, t60, [1.0] * 6)
        assert sabine_t60(room, 1 - beta ** 2) == pytest.approx(t60, abs=0.02)


def test_sampler_produces_valid_scene():
    cfg = sample_acoustic_scene(0, CFG)
    assert cfg["room_sz"].shape == (3,)
    assert cfg["mic_pos"].shape == (2, 3)
    assert cfg["src_traj_pts"].shape == (1, 3, 1)
    # mics inside the room
    assert np.all(cfg["mic_pos"] > 0) and np.all(cfg["mic_pos"] < cfg["room_sz"])
    # mic spacing respects scale of the +/-5cm template
    d = np.linalg.norm(cfg["mic_pos"][0] - cfg["mic_pos"][1])
    assert 0.03 - 1e-6 <= d <= 0.20 + 1e-6


def test_ism_direct_path_delay():
    """Direct-path RIR peak lands at dist/c with 1/(4 pi d) amplitude."""
    src = np.array([2.0, 3.0, 1.5])
    mic = np.array([[1.0, 1.0, 1.0]])
    rir = ism.simulate_rir_single([5, 5, 3], [0.9] * 6, src, mic, FS,
                                  T60=0.4, dp_only=True)
    dist = np.linalg.norm(src - mic[0])
    peak = np.argmax(rir[0])
    assert abs(peak - dist / 343.0 * FS) <= 1
    assert rir[0, peak] == pytest.approx(1 / (4 * np.pi * dist), rel=0.05)


def test_ism_t60_matches_specified():
    """Full ISM+tail RIR must pass the reference's own EDC T60 check."""
    room = [5.0, 4.0, 3.0]
    t60_spec = 0.4
    beta = beta_sabine(room, t60_spec, [1.0] * 6)
    t60_s = sabine_t60(room, 1 - beta ** 2)
    rir = ism.simulate_rir_single(room, beta, [2.5, 2.0, 1.5],
                                  [[1.5, 1.0, 1.2]], FS, T60=t60_s,
                                  rng=np.random.default_rng(0))
    t60_est, corr = t60_from_rir(rir[0], FS)
    assert abs(corr) > 0.9
    assert t60_est == pytest.approx(t60_spec, abs=0.08)


def test_ensure_built_idempotent_when_available():
    # the gen CLIs call this on startup; with the kernel already built it
    # must be a cheap no-op that reports availability truthfully
    if not native.available():
        pytest.skip("native lib not built")
    assert native.ensure_built(verbose=False) is True
    assert native.available()


def test_ism_native_matches_numpy():
    if not native.available():
        pytest.skip("native lib not built")
    room = [4.0, 3.5, 2.8]
    beta = beta_sabine(room, 0.3, [1.0] * 6)
    args = dict(room_sz=room, beta=beta, src_pos=[2.0, 1.5, 1.4],
                mic_pos=[[1.0, 1.0, 1.0], [1.1, 1.0, 1.0]], fs=FS,
                T60=sabine_t60(room, 1 - beta ** 2))
    r_native = ism.simulate_rir_single(**args, rng=np.random.default_rng(1))
    # force numpy path
    import sarssl_tpu.data.native as nat
    saved = nat._LIB
    try:
        nat._LIB = None
        r_numpy = ism.simulate_rir_single(**args, rng=np.random.default_rng(1))
    finally:
        nat._LIB = saved
    n_ism = int(ism.att2t_sabine(12.0, args["T60"]) * FS)  # ISM part only
    np.testing.assert_allclose(r_native[:, :n_ism], r_numpy[:, :n_ism],
                               atol=1e-6)


def test_diffuse_noise_coherence_matches_sinc():
    """Generated noise must reproduce the analytic sinc coherence
    (reference verification plot, utils_noise.py:255-272)."""
    rng = np.random.default_rng(0)
    mic_pos = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    noi = diffuse_noise(rng, FS * 4, mic_pos, FS)
    got = measured_coherence(noi)
    w_rad = 2 * np.pi * FS * np.arange(129) / 256
    want = desired_spatial_coherence(mic_pos, w_rad)[0, 1]
    # skip DC and the highest bins (windowing bias)
    err = np.abs(got[2:110] - want[2:110])
    assert err.mean() < 0.08, err.mean()


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((FS, 2)).astype(np.float32)
    noi = rng.standard_normal((FS, 2)).astype(np.float32)
    out = add_noise(sig, noi, snr_db=10.0, mic_sig_dp=sig)
    added = out - sig
    snr = 10 * np.log10(np.mean(sig ** 2) / np.mean(added ** 2))
    assert snr == pytest.approx(10.0, abs=0.5)


def test_tdoa_closed_form():
    mic_pos = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    src = np.array([[[10.0], [0.0], [0.0]]])  # on-axis: TDOA = -0.1/c
    tdoa = tdoa_from_geometry(src, mic_pos)
    assert tdoa[0, 0, 0] == pytest.approx(-0.1 / 343.0, rel=1e-6)


def test_drr_c50_on_synthetic_rir():
    """Two-tap RIR: direct at t0 with energy 1, echo at t0+60ms with energy
    0.25 -> DRR = C50 = 10*log10(4) ~ 6.02 dB."""
    nsamp = FS
    t0 = 100
    rir = np.zeros((1, 1, nsamp, 1))
    rir[0, 0, t0, 0] = 1.0
    rir[0, 0, t0 + int(0.06 * FS), 0] = 0.5
    rir_dp = np.zeros_like(rir)
    rir_dp[0, 0, t0, 0] = 1.0
    assert drr(rir, rir_dp, FS)[0, 0] == pytest.approx(6.02, abs=0.1)
    assert c50(rir, rir_dp, FS)[0, 0] == pytest.approx(6.02, abs=0.1)


def test_mean_absorption_formula():
    assert mean_absorption([5, 4, 3], 0.5) == pytest.approx(
        0.161 * 60 / (94 * 0.5), rel=1e-6)


def test_scene_synthesizer_end_to_end():
    synth = SceneSynthesizer(cfg=CFG, T=1.04, noise_type="spatial_white")
    sig, info = synth.generate(seed=3)
    assert sig.shape == (int(1.04 * FS), 2)
    assert np.abs(sig).max() == pytest.approx(0.9, abs=0.05)
    assert np.isfinite(info["TDOA"]) and np.isfinite(info["DRR"])
    assert abs(info["T60_edc"] - info["T60_specify"]) < 0.05
    # TDOA bounded by mic spacing / c
    d = np.linalg.norm(info["mic_pos"][0] - info["mic_pos"][1])
    assert abs(info["TDOA"]) <= d / 343.0 + 1e-6


def test_babble_and_xsrc_noise_are_diffuse():
    """New noise types keep the isotropic coherence structure: channels are
    correlated at low frequency, decorrelated at high frequency."""
    from sarssl_tpu.data import noise as nm

    rng = np.random.default_rng(0)
    fs, n = 16000, 16000
    mic_pos = np.array([[0.0, 0, 0], [0.1, 0, 0]])

    def speech(r):
        x = r.standard_normal(n)
        x[1:] += 0.8 * x[:-1]
        return x

    bab = nm.babble_noise(rng, n, mic_pos, fs, speech, nspeech=4)
    assert bab.shape == (n, 2) and np.isfinite(bab).all()
    coh = nm.measured_coherence(bab)
    assert coh[2] > 0.8 and abs(coh[-10]) < 0.4

    rec = speech(rng)
    xs = nm.xsrc_noise(rng, n, mic_pos, fs, rec, fs)
    assert xs.shape == (n, 2)
    coh2 = nm.measured_coherence(xs)
    assert coh2[2] > 0.7

    rw = nm.real_world_noise(rng, n, 2, np.stack([rec, rec], 1), 8000, fs)
    assert rw.shape == (n, 2)
    import pytest
    with pytest.raises(ValueError):
        nm.real_world_noise(rng, n, 3, np.stack([rec, rec], 1), fs, fs)


def test_dp_ratio_vad():
    from sarssl_tpu.data.annotations import mic_vad_dp_ratio

    fs = 16000
    n = fs
    rng = np.random.default_rng(0)
    dp = np.zeros((n, 2))
    dp[: n // 2] = rng.standard_normal((n // 2, 2))  # active first half
    noise = 0.01 * rng.standard_normal((n, 2))
    mix = dp + noise
    vad = mic_vad_dp_ratio(mix, dp, fs)
    assert vad.shape == (n, 1) and vad.dtype == np.float16
    win = int(fs * 0.032)
    assert float(vad[: (n // 2 // win) * win].mean()) > 0.5
    assert float(vad[n // 2 + win:].mean()) < 0.05


def test_scene_babble_and_vad(tmp_path):
    from sarssl_tpu.data.scene import SceneSynthesizer
    from sarssl_tpu.data.rooms import AcousticSamplerConfig

    cfg = AcousticSamplerConfig(room_sz_range=((4, 6), (4, 6), (2.5, 3)),
                                T60_range=(0.3, 0.5))
    synth = SceneSynthesizer(cfg=cfg, T=0.5, noise_type="diffuse_babble",
                             mic_vad="dp_ratio")
    sig, info = synth.generate(seed=3)
    assert sig.shape[1] == 2 and np.isfinite(sig).all()
    assert "mic_vad_src" in info and info["mic_vad_src"].shape[0] == sig.shape[0]


def test_remove_silence_energy_gate():
    from sarssl_tpu.data.sources import remove_silence

    fs = 16000
    rng = np.random.default_rng(0)
    sig = np.concatenate([np.zeros(fs), rng.standard_normal(fs),
                          np.zeros(fs)])
    out = remove_silence(sig, fs)
    assert len(out) < 1.3 * fs
    assert np.abs(out).std() > 0.5
    # all-silence input survives untouched (min-keep guard)
    quiet = 1e-8 * rng.standard_normal(fs)
    assert len(remove_silence(quiet, fs)) == fs


def test_moving_trajectory_distance_modes():
    """v1 adaptive trajectory modes: adjacent points ~10 cm apart
    (reference utils_simu_rir_sig.py:329-361)."""
    from dataclasses import replace

    base = replace(CFG, source_state="moving", nb_points=16)
    for mode in ("distance_line", "distance_sin"):
        cfg = sample_acoustic_scene(3, replace(base, traj_pt_mode=mode))
        pts = cfg["src_traj_pts"][:, :, 0]
        assert pts.shape[0] >= 2, mode
        # all points stay inside the room
        assert np.all(pts > 0) and np.all(pts < cfg["room_sz"])
        steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        if mode == "distance_sin":
            # arc-length-spaced: every adjacent pair ~desired 10 cm
            assert np.all(steps < 0.35) and np.median(steps) < 0.15
        else:
            # line-distance-spaced: count matches line length / 10 cm
            assert steps.mean() < 0.6


def test_moving_trajectory_time_mode_shape():
    from dataclasses import replace

    cfg = sample_acoustic_scene(4, replace(CFG, source_state="moving",
                                           nb_points=12))
    assert cfg["src_traj_pts"].shape == (12, 3, 1)


def test_noise_from_recordings_odd_sample_rates():
    """xsrc/real-world noise must survive resample_poly rounding at any
    source rate (regression: ragged np.stack / short signals)."""
    from sarssl_tpu.data import noise as nm

    rng = np.random.default_rng(0)
    mic_pos = np.array([[0.0, 0, 0], [0.1, 0, 0]])
    rec = rng.standard_normal(30000)
    for rec_fs in (11025, 16000, 44100, 48000):
        out = nm.xsrc_noise(rng, 65792, mic_pos, 16000, rec, rec_fs)
        assert out.shape == (65792, 2)
        rw = nm.real_world_noise(rng, 65792, 2, np.stack([rec, rec], 1),
                                 rec_fs, 16000)
        assert rw.shape == (65792, 2)


def test_synth_batch_tdoa_sign_matches_cross_correlation():
    """The synthetic generator's TDOA labels follow the annotation
    convention (positive = mic 1 receives LATER): the cross-correlation
    peak lag of (m1 vs m0) must equal the label."""
    from sarssl_tpu.data.synthetic import synth_batch

    rng = np.random.default_rng(7)
    wave, tdoa = synth_batch(rng, 8, 4096, max_tdoa=8, snr_range=(40.0, 40.0))
    for b in range(8):
        m0, m1 = wave[b, :, 0], wave[b, :, 1]
        lags = np.arange(-10, 11)
        xc = [np.dot(m1[max(0, l):4096 + min(0, l)],
                     m0[max(0, -l):4096 - max(0, l)]) for l in lags]
        # m1 delayed by 'lag' samples vs m0 -> peak at lag == tdoa label
        assert lags[int(np.argmax(xc))] == int(tdoa[b]), (
            b, tdoa[b], lags[int(np.argmax(xc))])


def test_scene_src_energy_vad():
    """'src_energy' VAD: the reference src_webrtc machinery with an energy
    detector — boolean per-sample per-source track through the dp RIR."""
    from dataclasses import replace

    synth = SceneSynthesizer(cfg=CFG, T=0.5, noise_type="spatial_white",
                             mic_vad="src_energy")
    sig, info = synth.generate(11)
    vad = info["mic_vad_src"]
    assert vad.dtype == bool and vad.shape == (int(0.5 * FS), 1)
    frac = vad.mean()
    assert 0.05 < frac <= 1.0, frac  # speech-like source: mostly active


def test_ism_first_order_images_analytic():
    """First-order wall reflections: each of the 6 image sources must
    produce a peak at its analytic delay with amplitude beta/(4 pi d_img)."""
    room = np.array([5.0, 4.0, 3.0])
    src = np.array([2.0, 1.5, 1.0])
    mic = np.array([[3.0, 2.5, 1.8]])
    beta = np.full(6, 0.8)
    rir = ism.simulate_rir_single(room, beta, src, mic, FS, T60=0.25,
                                  rng=np.random.default_rng(0))[0]
    c = 343.0
    # image positions for walls x=0, x=Lx, y=0, y=Ly, z=0, z=Lz
    images = [src * np.array([-1, 1, 1]),
              np.array([2 * room[0] - src[0], src[1], src[2]]),
              src * np.array([1, -1, 1]),
              np.array([src[0], 2 * room[1] - src[1], src[2]]),
              src * np.array([1, 1, -1]),
              np.array([src[0], src[1], 2 * room[2] - src[2]])]
    for img in images:
        d = float(np.linalg.norm(img - mic[0]))
        n = d / c * FS
        lo, hi = int(np.floor(n)) - 1, int(np.ceil(n)) + 2
        seg = np.abs(rir[lo:hi])
        expect = 0.8 / (4 * np.pi * d)
        # sinc interpolation spreads the tap; the local peak must carry
        # most of the expected image amplitude
        assert seg.max() > 0.5 * expect, (d, seg.max(), expect)
