"""Per-patch embedding encoder: local CNN front-end + global sequence model.

Equivalent of reference ``EmbedEncoder`` (/root/reference/code/model.py:18-262)
for the variants that actually run there ('fc'/'cnn'/'cnn_f_first' front ends
with 'conformer'/'transformer' globals). flax is NHWC-native, which is also
the TPU-friendly conv layout, so the patch-recovered TF map stays
``(nb, nf, nt, nch)`` end to end — no NCHW permutes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.patches import patch_recover
from .conformer import ConformerEncoder
from .transformer import TransformerEncoder
from .crnn import CRNN, CRNNSim, TCRNN


class CNNFrontEnd(nn.Module):
    """5-layer CNN: 1x1 -> 3x3 -> 3x3 -> 1x1 (BN+ReLU each) -> patch-strided conv.

    Mirrors model.py:50-64: channels nch->64->64->64->nch, then a
    Conv(kernel=patch_shape, stride=patch_shape) projecting to ``dembed``.
    Input/output are NHWC.
    """

    dembed: int
    patch_shape: Tuple[int, int]
    conv_chs: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        conv = lambda feats, k, name: nn.Conv(feats, kernel_size=k, use_bias=False,
                                              dtype=self.dtype, name=name)
        y = nn.relu(bn("bn0")(conv(self.conv_chs, (1, 1), "conv0")(x)))
        y = nn.relu(bn("bn1")(conv(self.conv_chs, (3, 3), "conv1")(y)))
        y = nn.relu(bn("bn2")(conv(self.conv_chs, (3, 3), "conv2")(y)))
        y = nn.relu(bn("bn3")(conv(nch, (1, 1), "conv3")(y)))
        y = nn.Conv(self.dembed, kernel_size=self.patch_shape,
                    strides=self.patch_shape, use_bias=False, padding="VALID",
                    dtype=self.dtype, name="proj")(y)
        return y  # (nb, nf/pf, nt/pt, dembed)


class EmbedEncoder(nn.Module):
    """Local front-end + global sequence model over patches.

    Args mirror the reference: ``model`` is a (local, global) pair from
    {'fc','cnn','cnn_f_first'} x {'conformer','transformer',''}; ``mode``
    selects the layer count (spec: 1 MHSA layer, spat: 3; model.py:38-43).
    """

    sig_shape: Tuple[int, int, int, int]  # (nf, nt, nreim, nmic)
    patch_shape: Tuple[int, int]
    dembed: int
    model: Sequence[str] = ("cnn", "conformer")
    mode: str = "spat"
    num_layers: int = 0  # 0 -> reference default by mode (spec 1 / spat 3)
    dropout: float = 0.1
    use_cls: bool = False  # append a learnable CLS token before the global
    # stage (reference model.py:84-90,216-219); output has npatch+1 tokens
    remat_local: bool = False  # rematerialize the CNN front-end
    fused_attention: bool = False  # Pallas fused attention (kernels/attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed: jax.Array, train: bool = False) -> jax.Array:
        # embed: (nb, npatch, dpatch*nreim*nmic)
        nf, nt, nreim, nmic = self.sig_shape
        nch = nreim * nmic
        pf, pt = self.patch_shape
        dpatch = pf * pt
        nb, npatch, _ = embed.shape
        mhsa_nlayer = self.num_layers or (1 if self.mode == "spec" else 3)

        local, global_ = (self.model[0], self.model[1] if len(self.model) > 1 else "")

        if len(self.model) == 1 and local in ("crnn", "crnn-sim", "tcrnn"):
            # single-model CRNN variants (reference model.py:96-148): patch
            # recover to the TF map, frame-wise outputs are the embeddings.
            v = embed.reshape(nb, npatch, dpatch, nch)
            tf = patch_recover(v, (nf, nt), self.patch_shape,
                               f_first=pt != 1)  # (nb, nf, nt, nch)
            if local == "crnn":
                if self.mode == "spec":
                    net = CRNN(nf=nf, planes=(32, 32, 64), f_stride=(1, 4, 4),
                               out_dim=self.dembed, dtype=self.dtype,
                               name="crnn")
                else:
                    net = CRNN(nf=nf, planes=(16, 16, 32, 64, 128),
                               f_stride=(1, 1, 4, 4, 4), out_dim=self.dembed,
                               dtype=self.dtype, name="crnn")
            elif local == "crnn-sim":
                net = CRNNSim(conv_chs=64, rnn_hid=self.dembed,
                              out_dim=self.dembed, dtype=self.dtype,
                              name="crnn")
            else:
                net = TCRNN(out_dim=self.dembed, dtype=self.dtype, name="crnn")
            return net(tf, train)  # (nb, nt==npatch, dembed)

        if local == "fc":
            x = nn.Dense(self.dembed, dtype=self.dtype, name="patch_proj")(embed)
        elif local in ("cnn", "cnn_f_first"):
            f_first = local == "cnn_f_first"
            v = embed.reshape(nb, npatch, dpatch, nch)
            tf = patch_recover(v, (nf, nt), self.patch_shape, f_first=f_first)
            cnn_cls = (nn.remat(CNNFrontEnd, static_argnums=(2,))
                       if self.remat_local else CNNFrontEnd)
            if f_first:
                # reference recovers onto a (nt, nf) canvas and convolves with a
                # transposed patch kernel (model.py:66-81)
                tf = jnp.swapaxes(tf, 1, 2)  # (nb, nt, nf, nch)
                front = cnn_cls(self.dembed, (pt, pf), dtype=self.dtype,
                                name="front")
            else:
                front = cnn_cls(self.dembed, self.patch_shape, dtype=self.dtype,
                                name="front")
            y = front(tf, train)  # (nb, h, w, dembed) with h*w == npatch
            x = y.reshape(nb, npatch, self.dembed)
        else:
            raise ValueError(f"Unsupported local model: {local}")

        if self.use_cls and global_ in ("conformer", "transformer"):
            cls = self.param("cls_token",
                             nn.initializers.truncated_normal(0.02),
                             (1, 1, self.dembed))
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cls.astype(x.dtype),
                                     (nb, 1, self.dembed))], axis=1)

        if global_ == "conformer":
            x = ConformerEncoder(self.dembed, mhsa_nlayer, num_heads=4,
                                 ff_expansion=4, dropout=self.dropout,
                                 fused_attention=self.fused_attention,
                                 dtype=self.dtype, name="global")(x, train)
        elif global_ == "transformer":
            x = TransformerEncoder(self.dembed, mhsa_nlayer, num_heads=4,
                                   dropout=self.dropout, dtype=self.dtype,
                                   name="global")(x, train)
        elif global_ == "":
            pass
        else:
            raise ValueError(f"Unsupported global model: {global_}")
        return x  # (nb, npatch, dembed)
