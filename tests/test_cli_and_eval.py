"""gen_simu round-trip through FixMicSigDataset, pretext eval metrics,
no-train MAE baseline, target transforms."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sarssl_tpu.cli.gen_simu import main as gen_simu_main
from sarssl_tpu.data import FixMicSigDataset, Selecting, batch_iterator
from sarssl_tpu.models import SARSSL, SARSSLConfig
from sarssl_tpu.ops import stft_features, gen_patch_mask
from sarssl_tpu.train.learner import mae_without_training
from sarssl_tpu.train.pretext_eval import pretext_metrics
from sarssl_tpu.train.steps import _target_transform


def test_gen_simu_roundtrip(tmp_path):
    out = str(tmp_path / "simu")
    rc = gen_simu_main(["--mode", "sig", "--stage", "pretest",
                        "--data-num", "3", "--save-dir", out,
                        "--workers", "1", "--T", "1.04",
                        "--noise", "spatial_white", "--save-dp",
                        "--t60-range", "0.3", "0.5",
                        "--room-x", "4", "6", "--room-y", "4", "6",
                        "--room-z", "2.5", "3"])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert "0.wav" in files and "0_dp.wav" in files and "0_info.npz" in files

    ds = FixMicSigDataset(out, load_anno=True)
    assert len(ds) == 3  # _dp.wav excluded
    sig, annos = ds[0]
    assert sig.shape == (16640, 2)
    assert np.isfinite(annos["TDOA"]) and np.isfinite(annos["T60"])
    assert np.isfinite(annos["SUR"]) and np.isfinite(annos["VOL"])

    # deterministic per-stage seeding: regenerating item 0 gives same bytes
    out2 = str(tmp_path / "simu2")
    gen_simu_main(["--mode", "sig", "--stage", "pretest", "--data-num", "1",
                   "--save-dir", out2, "--workers", "1", "--T", "1.04",
                   "--noise", "spatial_white",
                   "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    a = FixMicSigDataset(out)[0]
    b = FixMicSigDataset(out2)[0]
    np.testing.assert_array_equal(a, b)

    # batch iterator with labels
    wave, labels = next(batch_iterator(ds, 2, shuffle=False))
    assert wave.shape == (2, 16640, 2)
    assert labels["TDOA"].shape == (2,)

    # --idx0 extends a tree with disjoint per-item seeds: generating items
    # [1, 3) standalone reproduces the full run's items 1 and 2 byte-equal
    out3 = str(tmp_path / "simu3")
    gen_simu_main(["--mode", "sig", "--stage", "pretest", "--data-num", "2",
                   "--idx0", "1", "--save-dir", out3, "--workers", "1",
                   "--T", "1.04", "--noise", "spatial_white",
                   "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    assert sorted(f for f in os.listdir(out3) if f.endswith(".wav")) \
        == ["1.wav", "2.wav"]
    for i in (1, 2):
        with open(os.path.join(out, f"{i}.wav"), "rb") as fa, \
             open(os.path.join(out3, f"{i}.wav"), "rb") as fb:
            assert fa.read() == fb.read(), f"item {i} bytes differ"


def test_pretext_metrics_shapes():
    cfg = SARSSLConfig().tiny(sig_shape=(256, 8, 2, 2), patch_shape=(256, 1),
                              spec_dembed=32, spat_dembed=16)
    model = SARSSL(cfg)
    sig = np.random.default_rng(0).standard_normal((2, 2304, 2)).astype(np.float32)
    feats = stft_features(jnp.asarray(sig))
    mask = gen_patch_mask(jax.random.key(0), 2, cfg.npatch,
                          cfg.effective_nmasked())
    v = model.init({"params": jax.random.key(1)}, feats, mask, False)
    _, _, aux = model.apply(v, feats, mask, False)
    m = pretext_metrics(aux, cfg.sig_shape, cfg.patch_shape)
    assert np.isfinite(m["mse"]) and np.isfinite(m["mse_mask"])
    assert m["sig_pred"].shape == m["sig_tar"].shape
    assert m["sig_pred"].shape[0] == 2 and m["sig_pred"].shape[2] == 2
    assert m["mse_mask"] > 0
    # the reference denominator counts re AND im cells: recompute from aux
    from sarssl_tpu.ops.patches import patch_recover
    pred = np.asarray(patch_recover(aux["pred"].astype(jnp.float32),
                                    (cfg.sig_shape[0], cfg.sig_shape[1]),
                                    cfg.patch_shape))
    tar = np.asarray(patch_recover(aux["tar"].astype(jnp.float32),
                                   (cfg.sig_shape[0], cfg.sig_shape[1]),
                                   cfg.patch_shape))
    mp = np.asarray(aux["mask"].patch); chm = np.asarray(aux["mask"].ch)
    md = np.ones(pred.shape[:3] + (pred.shape[4],), np.float32)
    for b in range(2):
        md[b, :, mp[b].astype(bool), chm[b]] = 0.0
    md = np.broadcast_to(md[:, :, :, None, :], pred.shape)
    ref = ((pred - tar) ** 2 * (1 - md)).sum() / (1 - md).sum()
    assert m["mse_mask"] == pytest.approx(float(ref), rel=1e-5)


def test_mae_without_training():
    r = mae_without_training(np.array([0.0, 2.0]), np.array([1.0, 3.0]))
    assert r["mean"] == 1.0
    assert r["mae_train"] == 1.0
    assert r["mae_test"] == 1.0  # |1-1|=0, |3-1|=2 -> mean 1


def test_target_transforms():
    gt = jnp.asarray([[2.0], [4.0]])
    np.testing.assert_allclose(_target_transform("TDOA", gt),
                               np.array([[32000.0], [64000.0]]))
    np.testing.assert_allclose(np.asarray(_target_transform("VOL", gt)),
                               np.log10([[2.0], [4.0]]), rtol=1e-6)
    np.testing.assert_allclose(_target_transform("T60", gt), gt)


@pytest.mark.slow
def test_e2e_gen_simu_to_downstream(tmp_path):
    """Full pipeline: gen_simu writes a wav tree -> downstream CLI trains a
    T60 head on it and writes results.json (the verify recipe as a test)."""
    import json
    from sarssl_tpu.cli.gen_simu import main as gen_main
    from sarssl_tpu.cli.run_downstream import main as ds_main

    d = str(tmp_path / "data")
    e = str(tmp_path / "exp")
    rc = gen_main(["--mode", "sig", "--stage", "train", "--data-num", "6",
                   "--save-dir", d, "--workers", "0", "--T", "1.04",
                   "--noise", "spatial_white", "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    assert rc in (0, None)
    rc = ds_main(["--ds-train", "--cpu", "--ds-task", "T60", "--T", "1.04",
                  "--data-dir", d, "--exp-dir", e, "--epochs", "1",
                  "--lr-set", "0.001", "--bs-set", "2", "--ntrial", "1",
                  "--val-num", "6", "--test-num", "6", "--workers", "0"])
    assert rc in (0, None)
    results = list((tmp_path / "exp").rglob("results.json"))
    assert results, "downstream grid wrote no results.json"
    payload = json.loads(results[0].read_text())
    assert payload, "empty results"


@pytest.mark.slow
def test_e2e_pretrain_ckpt_into_downstream(tmp_path):
    """The flagship workflow through the CLIs: pretrain writes a checkpoint,
    downstream --pretrain-ckpt loads it (reference run_downstream.py:253-256).
    lineareval freezes the loaded encoders, so the downstream checkpoint's
    encoder params must equal the pretrain best checkpoint bit-for-bit —
    proof the transfer actually happened end to end."""
    from flax.traverse_util import flatten_dict
    from sarssl_tpu.cli.run_pretrain import main as pre_main
    from sarssl_tpu.cli.run_downstream import main as ds_main
    from sarssl_tpu.train import checkpoint as ckpt

    pre = str(tmp_path / "pre")
    rc = pre_main(["--smoke", "--exp-dir", pre])
    assert rc in (0, None)

    ds = str(tmp_path / "ds")
    rc = ds_main(["--smoke", "--ds-trainmode", "lineareval",
                  "--pretrain-ckpt", os.path.join(pre, "checkpoints"),
                  "--exp-dir", ds])
    assert rc in (0, None)

    pre_params = ckpt.load_checkpoint(
        ckpt.best_path(os.path.join(pre, "checkpoints")))["params"]
    cells = [p for p in os.listdir(ds) if p.startswith("trial")]
    assert cells
    ds_ck = os.path.join(ds, cells[0], "ckpt")
    path = (ckpt.ensemble_path(ds_ck)
            if os.path.exists(ckpt.ensemble_path(ds_ck))
            else ckpt.best_path(ds_ck))
    ds_params = ckpt.load_checkpoint(path)["params"]

    pre_enc = flatten_dict(pre_params["spec_encoder"])
    ds_enc = flatten_dict(ds_params["spec_encoder"])
    assert pre_enc.keys() == ds_enc.keys()
    for k in pre_enc:
        np.testing.assert_array_equal(
            np.asarray(pre_enc[k]), np.asarray(ds_enc[k]),
            err_msg=f"lineareval encoder param moved or was not loaded: {k}")
    # the head exists downstream only (it is not part of the pretext model)
    assert "head_proj" in ds_params and "head_proj" not in pre_params


def test_e2e_packed_grid_vmap_resident(tmp_path):
    """gen_simu -> pack_data -> grid-vmap downstream: the packed
    single-process path stages the split on device and trains by index
    gather (the flagship configuration, CPU-sized)."""
    import json
    from sarssl_tpu.cli.gen_simu import main as gen_main
    from sarssl_tpu.cli.pack_data import main as pack_main
    from sarssl_tpu.cli.run_downstream import main as ds_main

    d = str(tmp_path / "data")
    pk = str(tmp_path / "packed")
    e = str(tmp_path / "exp")
    rc = gen_main(["--mode", "sig", "--stage", "train", "--data-num", "6",
                   "--save-dir", d, "--workers", "0", "--T", "1.04",
                   "--noise", "spatial_white", "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    assert rc in (0, None)
    rc = pack_main(["--data-dir", d, "--out", pk])
    assert rc in (0, None)
    rc = ds_main(["--ds-train", "--cpu", "--ds-task", "T60", "--T", "1.04",
                  "--grid-vmap", "--scan-block", "2", "--data-dir", pk,
                  "--exp-dir", e, "--epochs", "2", "--lr-set", "0.001",
                  "--bs-set", "2", "--ntrial", "1", "--train-num", "4",
                  "--val-num", "4", "--test-num", "4", "--workers", "0"])
    assert rc in (0, None)
    payload = json.loads((tmp_path / "exp" / "results.json").read_text())
    assert payload["cells"], payload
    assert all(np.isfinite(c["test_mae"])
               for c in payload["cells"].values())


def test_pretrain_resident_matches_streaming(tmp_path):
    """--resident (whole packed split staged on device, per-epoch index
    gathers) must train bit-identically to the streaming packed path: the
    same batch_indices stream drives both, so the best checkpoints agree
    param-for-param."""
    from flax.traverse_util import flatten_dict
    from sarssl_tpu.cli.gen_simu import main as gen_main
    from sarssl_tpu.cli.pack_data import main as pack_main
    from sarssl_tpu.cli.run_pretrain import main as pre_main
    from sarssl_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "data")
    pk = str(tmp_path / "packed")
    rc = gen_main(["--mode", "sig", "--stage", "train", "--data-num", "8",
                   "--save-dir", d, "--workers", "0", "--T", "1.04",
                   "--noise", "spatial_white", "--t60-range", "0.3", "0.5",
                   "--room-x", "4", "6", "--room-y", "4", "6",
                   "--room-z", "2.5", "3"])
    assert rc in (0, None)
    rc = pack_main(["--data-dir", d, "--out", pk])
    assert rc in (0, None)

    params = {}
    for mode, extra in (("stream", []), ("resident", ["--resident"]),
                        ("resident_i16", ["--resident",
                                          "--resident-dtype", "int16"])):
        e = str(tmp_path / f"exp_{mode}")
        rc = pre_main(["--smoke", "--data-dir", pk, "--exp-dir", e] + extra)
        assert rc in (0, None)
        params[mode] = flatten_dict(ckpt.load_checkpoint(
            ckpt.best_path(os.path.join(e, "checkpoints")))["params"])

    assert params["stream"].keys() == params["resident"].keys()
    for k in params["stream"]:
        np.testing.assert_array_equal(
            np.asarray(params["stream"][k]), np.asarray(params["resident"][k]),
            err_msg=f"resident pretrain diverged from streaming at {k}")
        # int16 staging: ~-90 dB input quantization must stay a tiny
        # perturbation of the trained params, not a different trajectory.
        # Adam turns any gradient-sign flip into an O(lr) step, so the
        # bound is a few lr (smoke: lr 1e-3 x 8 steps), not the input eps
        np.testing.assert_allclose(
            np.asarray(params["resident_i16"][k]),
            np.asarray(params["stream"][k]), atol=6e-3, rtol=0,
            err_msg=f"int16-resident pretrain diverged at {k}")


def test_grid_vmap_time_budget_still_writes_results(tmp_path):
    """--time-budget ends the grid-vmap epoch loop gracefully: the run
    must stop after the first epoch (budget ~0), yet still ensemble, run
    the test eval and write results.json + results.partial.json — the
    guarantee that an outer kill deadline can never erase a grid run."""
    import json
    from sarssl_tpu.cli.run_downstream import main as ds_main

    e = str(tmp_path / "exp")
    rc = ds_main(["--smoke", "--grid-vmap", "--time-budget", "0.001",
                  "--scan-block", "3", "--exp-dir", e])
    assert rc in (0, None)
    payload = json.loads((tmp_path / "exp" / "results.json").read_text())
    cells = payload["cells"]
    assert cells, f"no cells in results.json: {payload}"
    for cell in cells.values():
        assert cell["epochs_run"] == 1, (
            "budget ~0 should have stopped every cell after epoch 0, got "
            f"{cell['epochs_run']} epochs")
        assert np.isfinite(cell["test_mae"])
    assert (tmp_path / "exp" / "results.partial.json").exists()


@pytest.mark.slow
def test_e2e_real_mix_pretrain(tmp_path):
    """Real-corpus pretraining path end to end: a synthetic stereo corpus
    tree -> RandomRealDataset mixing -> one tiny pretrain epoch."""
    import numpy as np
    from sarssl_tpu.data.wavio import write_wav
    from sarssl_tpu.cli.run_pretrain import main as pre_main

    rng = np.random.default_rng(0)
    d = tmp_path / "corpusA"
    d.mkdir()
    for i in range(6):
        write_wav(str(d / f"rec{i}.wav"),
                  (rng.standard_normal((24000, 2)) * 0.1).astype(np.float32),
                  16000)
    rc = pre_main(["--smoke", "--real-data-dirs", str(d),
                   "--exp-dir", str(tmp_path / "exp")])
    assert rc in (0, None)


def test_pretext_metrics_match_torch_reference_math():
    """mse/mse_mask/mse_mask_ch agree with a torch re-enactment of the
    reference pretrain_evaluate (learner.py:574-601), incl. the re/im-tiled
    mask denominator."""
    import numpy as np
    import torch
    import jax
    from sarssl_tpu.ops.mask import PatchMask
    from sarssl_tpu.ops.patches import patch_split
    from sarssl_tpu.train.pretext_eval import pretext_metrics

    nb, nf, nt, nmic = 2, 8, 6, 2
    rng = np.random.default_rng(3)
    pred_tf = rng.standard_normal((nb, nf, nt, 2, nmic)).astype(np.float32)
    tar_tf = rng.standard_normal((nb, nf, nt, 2, nmic)).astype(np.float32)
    # mask: frames 1,3 masked on channel chosen per item
    patch = np.zeros((nb, nt), np.float32); patch[:, [1, 3]] = 1.0
    ch = np.array([0, 1])
    mask = PatchMask(patch=jnp.asarray(patch),
                     ch=jnp.asarray(ch),
                     idx=jnp.asarray(np.tile([1, 3], (nb, 1))))

    split = lambda x: patch_split(jnp.asarray(x), (nf, 1))
    aux = {"pred": split(pred_tf), "tar": split(tar_tf), "mask": mask}
    m = pretext_metrics(aux, (nf, nt), (nf, 1))

    # torch re-enactment (mask_batch: 1 = kept)
    mask_dense = np.ones((nb, nf, nt, nmic), np.float32)
    for b in range(nb):
        mask_dense[b, :, [1, 3], ch[b]] = 0.0
    tp, tg = torch.from_numpy(pred_tf), torch.from_numpy(tar_tf)
    md = torch.from_numpy(mask_dense)[:, :, :, None, :].tile(1, 1, 1, 2, 1)
    diff = (tp - tg) ** 2
    diff_mask = diff * (1 - md)
    ref_mse_mask = (diff_mask.sum() / (1 - md).sum()).item()
    ref_mse_mask_ch = torch.mean(diff_mask.sum(dim=4)).item()
    ref_mse = diff.mean().item()

    assert m["mse"] == pytest.approx(ref_mse, rel=1e-5)
    assert m["mse_mask"] == pytest.approx(ref_mse_mask, rel=1e-5)
    assert m["mse_mask_ch"] == pytest.approx(ref_mse_mask_ch, rel=1e-5)
