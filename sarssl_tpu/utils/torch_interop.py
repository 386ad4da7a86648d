"""Weight-transplant interop with the PyTorch reference implementation.

Purpose: *measured* forward parity. We build the actual reference ``SARSSL``
(/root/reference/code/model.py:350-601) on CPU, transplant the flax parameters
into its state dict, feed both models one seeded feature batch with an
identical mask, and compare pretext loss / reconstruction.

The reference module imports two things that are broken or absent in a
minimal environment (and in the reference repo itself):

  * ``timm.models.layers.trunc_normal_`` (model.py:5) — shimmed with
    ``torch.nn.init.trunc_normal_``;
  * ``common.NBC / common.FNSSL / common.UNet / common.CNN``
    (model.py:12-15) — ablation encoders whose source files do not exist in
    the reference ``common/`` package; shimmed with placeholder objects (the
    default MC-Conformer config never instantiates them).

Nothing from the reference is copied here; this module only *loads* it to
measure against.
"""
from __future__ import annotations

import sys
import types
from typing import Dict

import numpy as np

REFERENCE_CODE_DIR = "/root/reference/code"


def load_reference_model_module(code_dir: str = REFERENCE_CODE_DIR):
    """Import the reference ``model`` module with import shims installed."""
    import torch

    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    if code_dir not in sys.path:
        sys.path.insert(0, code_dir)

    # Dead ablation imports (model.py:12-15): the files are absent from the
    # reference's common/ package. Register placeholder submodules before the
    # package tries to resolve them.
    for name, attrs in {
        "common.NBC": ("NBC",),
        "common.FNSSL": ("FNblock",),
        "common.UNet": ("UNet",),
        "common.CNN": ("resnet50", "res2net50", "densenet121"),
    }.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for attr in attrs:
                setattr(mod, attr, object)
            sys.modules[name] = mod

    import importlib

    return importlib.import_module("model")


# --------------------------------------------------------------------------
# flax -> torch key mapping
# --------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _dense(out: Dict[str, np.ndarray], tkey: str, p: Dict, bias: bool = True):
    out[f"{tkey}.weight"] = _np(p["kernel"]).T
    if bias:
        out[f"{tkey}.bias"] = _np(p["bias"])


def _layernorm(out, tkey, p):
    out[f"{tkey}.weight"] = _np(p["scale"])
    out[f"{tkey}.bias"] = _np(p["bias"])


def _batchnorm(out, tkey, p, stats):
    out[f"{tkey}.weight"] = _np(p["scale"])
    out[f"{tkey}.bias"] = _np(p["bias"])
    out[f"{tkey}.running_mean"] = _np(stats["mean"])
    out[f"{tkey}.running_var"] = _np(stats["var"])


def _conv2d(out, tkey, p):
    # flax (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    out[f"{tkey}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)


def _conformer_block(out, tprefix: str, p: Dict, stats: Dict):
    """One reference ConformerBlock (Conformer.py:16-91) from a flax block."""
    for ff, seq_idx in (("ff1", 0), ("ff2", 3)):
        base = f"{tprefix}.sequential.{seq_idx}.module.sequential"
        _layernorm(out, f"{base}.0", p[ff]["LayerNorm_0"])
        _dense(out, f"{base}.1.linear", p[ff]["Dense_0"])
        _dense(out, f"{base}.4.linear", p[ff]["Dense_1"])

    att = f"{tprefix}.sequential.1.module"
    _layernorm(out, f"{att}.layer_norm", p["mhsa_ln"])
    _dense(out, f"{att}.attention.query_proj.linear", p["mhsa"]["query"])
    _dense(out, f"{att}.attention.key_proj.linear", p["mhsa"]["key"])
    _dense(out, f"{att}.attention.value_proj.linear", p["mhsa"]["value"])
    _dense(out, f"{att}.attention.pos_proj.linear", p["mhsa"]["pos"], bias=False)
    _dense(out, f"{att}.attention.out_proj.linear", p["mhsa"]["out"])
    out[f"{att}.attention.u_bias"] = _np(p["mhsa"]["u_bias"])
    out[f"{att}.attention.v_bias"] = _np(p["mhsa"]["v_bias"])

    conv = f"{tprefix}.sequential.2.module.sequential"
    _layernorm(out, f"{conv}.0", p["conv"]["LayerNorm_0"])
    # pointwise convs are Dense in flax: (cin, cout) -> (cout, cin, 1)
    out[f"{conv}.2.conv.weight"] = _np(p["conv"]["Dense_0"]["kernel"]).T[:, :, None]
    out[f"{conv}.2.conv.bias"] = _np(p["conv"]["Dense_0"]["bias"])
    # depthwise: flax (k, 1, ch) -> torch (ch, 1, k)
    out[f"{conv}.4.conv.weight"] = _np(p["conv"]["Conv_0"]["kernel"]).transpose(2, 1, 0)
    _batchnorm(out, f"{conv}.5", p["conv"]["BatchNorm_0"],
               stats["conv"]["BatchNorm_0"])
    out[f"{conv}.7.conv.weight"] = _np(p["conv"]["Dense_1"]["kernel"]).T[:, :, None]
    out[f"{conv}.7.conv.bias"] = _np(p["conv"]["Dense_1"]["bias"])

    _layernorm(out, f"{tprefix}.sequential.4", p["final_ln"])


def _cnn_front(out, tprefix: str, p: Dict, stats: Dict):
    """Reference EmbedEncoder.patch_embed Sequential (model.py:50-64)."""
    for conv_name, bn_name, conv_idx, bn_idx in (
        ("conv0", "bn0", 0, 1), ("conv1", "bn1", 3, 4),
        ("conv2", "bn2", 6, 7), ("conv3", "bn3", 9, 10),
    ):
        _conv2d(out, f"{tprefix}.{conv_idx}", p[conv_name])
        _batchnorm(out, f"{tprefix}.{bn_idx}", p[bn_name], stats[bn_name])
    _conv2d(out, f"{tprefix}.12", p["proj"])


def _encoder(out, tname: str, p: Dict, stats: Dict, nlayers: int):
    _cnn_front(out, f"{tname}.patch_embed", p["front"], stats["front"])
    for i in range(nlayers):
        _conformer_block(out, f"{tname}.embed.layers.{i}",
                         p["global"][f"block{i}"], stats["global"][f"block{i}"])
    if "cls_token" in p:
        out[f"{tname}.cls_token"] = _np(p["cls_token"])


def flax_to_torch_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Convert a flax SARSSL variable collection into the reference SARSSL
    state-dict layout (numpy arrays; caller wraps in torch tensors)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    assert "spec_encoder" in stats, (
        "flax_to_torch_state_dict needs the 'batch_stats' collection (the "
        "reference CNN front-ends carry BatchNorm running stats); pass the "
        "full variables dict from model.init/apply")
    out: Dict[str, np.ndarray] = {}
    _encoder(out, "spec_encoder", params["spec_encoder"],
             stats["spec_encoder"], cfg.spec_layers)
    _encoder(out, "spat_encoder", params["spat_encoder"],
             stats["spat_encoder"], cfg.spat_layers)
    if cfg.pretrain:
        _dense(out, "decoder.proj.0", params["decoder"]["proj0"])
        _dense(out, "decoder.proj.2", params["decoder"]["proj1"])
    else:
        _layernorm(out, "mlp_head.0", params["head_norm"])
        _dense(out, "mlp_head.1", params["head_proj"])
    return out


def load_into_torch_model(net, variables, cfg):
    """Load transplanted weights; assert only buffers are left untouched."""
    import torch

    sd = {k: torch.from_numpy(v.copy())
          for k, v in flax_to_torch_state_dict(variables, cfg).items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected}"
    leftovers = [k for k in missing if "positional_encoding.pe" not in k]
    assert not leftovers, f"unmapped reference parameters: {leftovers}"
    return net


def make_fixed_patch_mask(mask_patch: np.ndarray, mask_ch: np.ndarray,
                          mask_idx: np.ndarray, dpatch: int, nmic: int):
    """A drop-in replacement for the reference ``PatchMask`` module that
    replays a precomputed mask (so both frameworks see identical masking).

    mask semantics match utils_module.py:255-273: the returned dense arrays
    are 1 everywhere except 0 at (masked patch, masked channel) /
    (masked patch, *) / (*, masked channel) respectively.
    """
    import torch
    import torch.nn as nn

    nb, npatch = mask_patch.shape
    dense = torch.ones((nb, npatch, dpatch, nmic))
    patch_dense = torch.ones((nb, npatch, dpatch, nmic))
    ch_dense = torch.ones((nb, npatch, dpatch, nmic))
    idx = torch.from_numpy(np.array(mask_idx, copy=True)).long()
    ch = torch.from_numpy(np.array(mask_ch, copy=True)).long()
    for b in range(nb):
        dense[b, idx[b], :, ch[b]] = 0
        patch_dense[b, idx[b], :, :] = 0
        ch_dense[b, :, :, ch[b]] = 0

    class FixedPatchMask(nn.Module):
        def forward(self, data_shape):
            return dense, patch_dense, ch_dense, idx, ch[:, None]

    return FixedPatchMask()
