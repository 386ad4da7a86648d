"""Two-sided forward parity vs the PyTorch reference (weight transplant).

Builds the actual reference SARSSL (/root/reference/code/model.py:350-601) on
CPU, transplants the flax parameters into its state dict, feeds both models
one seeded feature batch with an identical mask, and reports pretext-loss and
reconstruction agreement. Writes PARITY.json at the repo root.

Usage:  python scripts/reference_parity.py [--nt 256] [--nb 2] [--full]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_parity(nt: int = 64, nb: int = 2, seed: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from sarssl_tpu.models import SARSSL, SARSSLConfig
    from sarssl_tpu.ops import gen_patch_mask
    from sarssl_tpu.utils.torch_interop import (
        load_reference_model_module, load_into_torch_model,
        make_fixed_patch_mask)

    torch.manual_seed(seed)
    nf, nreim, nmic = 256, 2, 2
    cfg = SARSSLConfig(sig_shape=(nf, nt, nreim, nmic))

    # --- flax side ---------------------------------------------------------
    rng = np.random.default_rng(seed)
    x_np = rng.standard_normal((nb, nmic, nf, nt, nreim)).astype(np.float32)
    model = SARSSL(cfg)
    mask = gen_patch_mask(jax.random.key(seed + 1), nb, cfg.npatch,
                          cfg.effective_nmasked(), nmic=nmic)
    variables = model.init({"params": jax.random.key(seed + 2)},
                           jnp.asarray(x_np), mask, False)
    loss_j, diff_j, aux = model.apply(variables, jnp.asarray(x_np), mask, False)
    loss_j, diff_j = float(loss_j), float(diff_j)
    pred_j = np.asarray(aux["pred"])  # (nb, npatch, dpatch, 2, nmic)

    # --- torch reference side ----------------------------------------------
    ref_model_mod = load_reference_model_module()
    net = ref_model_mod.SARSSL(sig_shape=[nf, nt, nreim, nmic],
                               patch_shape=(256, 1), patch_mode="T",
                               nmasked_patch=cfg.effective_nmasked(),
                               pretrain=True, device="cpu")
    net.eval()
    load_into_torch_model(net, variables, cfg)
    net.patch_mask = make_fixed_patch_mask(
        np.asarray(mask.patch), np.asarray(mask.ch), np.asarray(mask.idx),
        dpatch=cfg.dpatch, nmic=nmic)
    with torch.no_grad():
        loss_t, diff_t, vis = net(torch.from_numpy(x_np))
    loss_t, diff_t = float(loss_t), float(diff_t)
    pred_t = vis["pred"].numpy()  # (nb, nf, nt, 2, nmic) patch-recovered

    # reconstruction comparison in the TF domain
    from sarssl_tpu.ops.patches import patch_recover
    pred_j_tf = np.asarray(patch_recover(jnp.asarray(pred_j), (nf, nt),
                                         cfg.patch_shape))
    recon_mse = float(np.mean((pred_j_tf - pred_t) ** 2))
    recon_max = float(np.max(np.abs(pred_j_tf - pred_t)))

    # --- downstream head parity --------------------------------------------
    cfg_ds = SARSSLConfig(**{**cfg.__dict__, "pretrain": False})
    model_ds = SARSSL(cfg_ds)
    vars_ds = model_ds.init({"params": jax.random.key(seed + 3)},
                            jnp.asarray(x_np), None, False)
    # reuse pretext encoder weights to mimic checkpoint transfer
    vars_ds = jax.tree_util.tree_map(lambda x: x, vars_ds)
    params_ds = dict(vars_ds["params"])
    params_ds["spec_encoder"] = variables["params"]["spec_encoder"]
    params_ds["spat_encoder"] = variables["params"]["spat_encoder"]
    vars_ds = {"params": params_ds,
               "batch_stats": {**vars_ds["batch_stats"],
                               "spec_encoder": variables["batch_stats"]["spec_encoder"],
                               "spat_encoder": variables["batch_stats"]["spat_encoder"]}}
    pred_ds_j, emb_j = model_ds.apply(vars_ds, jnp.asarray(x_np), None, False)

    net_ds = ref_model_mod.SARSSL(sig_shape=[nf, nt, nreim, nmic],
                                  patch_shape=(256, 1), pretrain=False,
                                  downstream_embed="spec_spat",
                                  downstream_dlabel=1, device="cpu")
    net_ds.eval()
    load_into_torch_model(net_ds, vars_ds, cfg_ds)
    with torch.no_grad():
        pred_ds_t, emb_t = net_ds(torch.from_numpy(x_np))
    ds_max = float(np.max(np.abs(np.asarray(pred_ds_j) - pred_ds_t.numpy())))
    emb_max = float(np.max(np.abs(np.asarray(emb_j) - emb_t.numpy())))

    return {
        "config": f"full-dims nf=256 nt={nt} nb={nb} (spec 512x1, spat 256x3)",
        "mode": "weight-transplant forward parity vs /root/reference/code/model.py",
        "pretext_loss_jax": loss_j,
        "pretext_loss_torch": loss_t,
        "pretext_loss_absdiff": abs(loss_j - loss_t),
        "diff_jax": diff_j,
        "diff_torch": diff_t,
        "diff_absdiff": abs(diff_j - diff_t),
        "recon_mse_between_frameworks": recon_mse,
        "recon_maxabs_between_frameworks": recon_max,
        "downstream_pred_maxabs": ds_max,
        "downstream_embed_maxabs": emb_max,
        "tolerance": 1e-3,
        "pass": bool(abs(loss_j - loss_t) <= 1e-3 and recon_mse <= 1e-3
                     and ds_max <= 1e-3),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=64)
    ap.add_argument("--nb", type=int, default=2)
    ap.add_argument("--full", action="store_true",
                    help="use the full nt=256 training shape")
    args = ap.parse_args()
    nt = 256 if args.full else args.nt
    result = run_parity(nt=nt, nb=args.nb)
    print(json.dumps(result, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}")
    sys.exit(0 if result["pass"] else 1)
