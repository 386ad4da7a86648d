"""real/sim mixed downstream training: the RandomMixDataset mechanism,
gen_simu --mode rir trees, the SimRIRDataset sim arm, and the reference's
real-world ds_setting grids (opt.py:216-256, dataset.py:232-382)."""
import os

import numpy as np
import pytest

from sarssl_tpu.config import real_ds_setting
from sarssl_tpu.data import RandomMixDataset


class _Const:
    """Tiny labeled dataset: every item is (tag, inner_idx)."""

    def __init__(self, tag, n=10):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return (self.tag, idx)


def test_real_ds_setting_table():
    for ratio in ((1, 0), (1, 1), (0, 1)):
        s = real_ds_setting("TDOA", "finetune", ratio)
        assert s["num"] == 80_000
        assert s["bs_set"] == [16] and s["lr_set"] == [1e-3, 1e-4]
        assert s["nepoch"] == 200 and s["ntrial"] == 1
    assert real_ds_setting("T60", "finetune", (1, 0))["num"] == 1600
    assert real_ds_setting("T60", "finetune", (1, 1))["num"] == 3200
    assert real_ds_setting("T60", "finetune", (0, 1))["num"] == 32_000
    assert real_ds_setting("DRR", "scratchlow", (1, 1))["num"] == 16_000
    assert real_ds_setting("C50", "scratchlow", (0, 1))["num"] == 32_000
    with pytest.raises(ValueError):
        real_ds_setting("T60", "lineareval", (1, 1))
    with pytest.raises(AssertionError):
        real_ds_setting("T60", "finetune", (0, 0))


def test_random_mix_determinism_and_stats():
    ds = RandomMixDataset([_Const("a"), _Const("b")], length=400, seed=7)
    assert len(ds) == 400
    # per-index purity: same idx -> same item, independent of access order
    assert ds[5] == ds[5]
    items = [ds[i] for i in range(400)]
    assert items[:10] == [ds[i] for i in range(10)]
    counts = {"a": 0, "b": 0}
    for tag, _ in items:
        counts[tag] += 1
    # default probs are 50/50; 400 draws stay within 5 sigma (~0.125)
    assert abs(counts["a"] / 400 - 0.5) < 0.125
    # different seed -> different arm sequence
    ds2 = RandomMixDataset([_Const("a"), _Const("b")], length=400, seed=8)
    assert [ds2[i] for i in range(400)] != items

    # single-arm ratios degenerate correctly
    only_a = RandomMixDataset([_Const("a")], length=20, seed=1)
    assert all(only_a[i][0] == "a" for i in range(20))

    # explicit probs
    skew = RandomMixDataset([_Const("a"), _Const("b")], length=400, seed=3,
                            probs=[9, 1])
    na = sum(1 for i in range(400) if skew[i][0] == "a")
    assert na > 320


class _StubSource:
    """Minimal speaker-source stand-in for MicSigFromRIRDataset."""

    def __init__(self, nsample):
        self.nsample = nsample

    def sample(self, rng):
        x = rng.standard_normal((self.nsample, 1)).astype(np.float32)
        x[1:] += 0.7 * x[:-1]
        return x


def test_gen_simu_rir_mode_and_sim_arm(tmp_path):
    """gen_simu --mode rir writes a sim-RIR tree; SimRIRDataset reads it and
    the MicSigFromRIRDataset sim arm synthesizes annotated signals using the
    exact direct-path RIR from the info bundle."""
    from sarssl_tpu.cli.gen_simu import main as gen_main
    from sarssl_tpu.data import SimRIRDataset, MicSigFromRIRDataset

    d = str(tmp_path / "rirs")
    rc = gen_main(["--mode", "rir", "--stage", "train", "--data-num", "2",
                   "--save-dir", d, "--workers", "1",
                   "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    assert rc in (0, None)
    files = sorted(os.listdir(d))
    assert "0_rir.npy" in files and "0_rir_info.npz" in files
    assert not any(f.endswith(".wav") for f in files)

    rirs = SimRIRDataset(d)
    assert len(rirs) == 2
    rir, info, noi = rirs.get(0)
    assert rir.ndim == 2 and rir.shape[1] == 2 and noi is None
    # dp RIR: same mics, shorter support (dp-only Tmax), less energy
    assert "rir_dp" in info and info["rir_dp"].ndim == 2
    assert info["rir_dp"].shape[1] == rir.shape[1]
    assert np.sum(info["rir_dp"] ** 2) <= np.sum(rir ** 2) + 1e-9
    assert np.isfinite(np.float32(info["T60_edc"]))

    T, fs = 1.04, 16000
    ds = MicSigFromRIRDataset(rirs, _StubSource(int(T * fs) + 4000), T=T,
                              fs=fs, seed=11, length=6,
                              noise_type="diffuse_white")
    sig, annos = ds[0]
    assert sig.shape == (int(T * fs), 2) and sig.dtype == np.float32
    assert np.isfinite(sig).all() and np.abs(sig).max() <= 0.9 + 1e-6
    for k in ("T60", "DRR", "C50", "TDOA", "SNR", "ABS"):
        assert np.isfinite(annos[k]), k
    # per-index determinism
    sig2, annos2 = ds[0]
    np.testing.assert_array_equal(sig, sig2)

    # mixture of two arms yields items from both (distinguished by seed)
    ds_b = MicSigFromRIRDataset(rirs, _StubSource(int(T * fs) + 4000), T=T,
                                fs=fs, seed=99, length=6,
                                noise_type="diffuse_white")
    mix = RandomMixDataset([ds, ds_b], length=32, seed=5)
    w, a = mix[0]
    assert w.shape == (int(T * fs), 2)


@pytest.mark.slow
def test_e2e_downstream_real_sim_rir_mix(tmp_path):
    """Downstream CLI end to end on the on-the-fly real+sim RIR mixture:
    --rir-dir (legacy real npy RIRs) + --sim-rir-dir (gen_simu rir tree) +
    --real-sim-ratio 1 1 trains and writes results.json; val/test use the
    real arm (reference run_downstream.py:193-214)."""
    import json
    from sarssl_tpu.cli.gen_simu import main as gen_main
    from sarssl_tpu.cli.run_downstream import main as ds_main
    from sarssl_tpu.data.wavio import write_wav

    simd = str(tmp_path / "simrirs")
    gen_main(["--mode", "rir", "--stage", "train", "--data-num", "2",
              "--save-dir", simd, "--workers", "1",
              "--t60-range", "0.3", "0.5", "--room-x", "4", "6",
              "--room-y", "4", "6", "--room-z", "2.5", "3"])

    # fake 'real' RIR tree in the legacy (nsamp, nmic) npy schema
    rng = np.random.default_rng(0)
    reald = tmp_path / "realrirs"
    reald.mkdir()
    for i in range(2):
        r = np.zeros((4000, 2), np.float32)
        r[40 + i, 0] = 1.0
        r[44 + i, 1] = 0.8
        r[200:1200] += (rng.standard_normal((1000, 2)) *
                        np.exp(-np.arange(1000) / 300)[:, None] * 0.05)
        np.save(str(reald / f"SP{i}.npy"), r)

    srcd = tmp_path / "src" / "spk0"
    srcd.mkdir(parents=True)
    for i in range(2):
        write_wav(str(srcd / f"u{i}.wav"),
                  (rng.standard_normal((24000, 1)) * 0.1).astype(np.float32),
                  16000)

    e = str(tmp_path / "exp")
    rc = ds_main(["--ds-train", "--cpu", "--ds-task", "T60", "--T", "1.04",
                  "--rir-dir", str(reald), "--sim-rir-dir", simd,
                  "--src-dir", str(tmp_path / "src"),
                  "--real-sim-ratio", "1", "1",
                  "--exp-dir", e, "--epochs", "1", "--lr-set", "0.001",
                  "--bs-set", "2", "--ntrial", "1", "--train-num", "8",
                  "--val-num", "4", "--test-num", "4", "--workers", "0"])
    assert rc in (0, None)
    results = list((tmp_path / "exp").rglob("results.json"))
    assert results
    payload = json.loads(results[0].read_text())
    assert np.isfinite(payload["best_test_mae"])
