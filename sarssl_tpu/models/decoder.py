"""Embedding decoder: optional sequence stage + MLP projection back to patches.

Equivalent of reference ``EmbedDecoder`` (/root/reference/code/model.py:264-347)
for the configurations the drivers use (dec_model=['', 'fc'] and
['conformer'|'transformer', 'fc']): project each patch embedding to
``dpatch * nreim * nmic`` reconstruction values through a 2-layer MLP with a
3x expansion (model.py:295-301).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .conformer import ConformerEncoder
from .transformer import TransformerEncoder


class EmbedDecoder(nn.Module):
    sig_shape: Tuple[int, int, int, int]  # (nf, nt, nreim, nmic)
    patch_shape: Tuple[int, int]
    dembed: int
    model: Sequence[str] = ("", "fc")
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed: jax.Array, train: bool = False) -> jax.Array:
        nf, nt, nreim, nmic = self.sig_shape
        dpatch = self.patch_shape[0] * self.patch_shape[1]
        dembed_out = dpatch * nreim * nmic

        stage = self.model[0]
        if stage == "conformer":
            embed = ConformerEncoder(self.dembed, 1, num_heads=4, ff_expansion=4,
                                     dropout=self.dropout, dtype=self.dtype,
                                     name="seq")(embed, train)
        elif stage == "transformer":
            embed = TransformerEncoder(self.dembed, 1, num_heads=4,
                                       dropout=self.dropout, dtype=self.dtype,
                                       name="seq")(embed, train)
        elif stage != "":
            raise ValueError(f"Unsupported decoder stage: {stage}")

        if self.model[1] == "fc":
            y = nn.Dense(dembed_out * 3, dtype=self.dtype, name="proj0")(embed)
            y = nn.relu(y)
            y = nn.Dense(dembed_out, dtype=self.dtype, name="proj1")(y)
            return y  # (nb, npatch, dpatch*nreim*nmic)
        if self.model[1] == "cnn":
            # CNN reconstruction head (model.py:302-318,336-343): spread the
            # embedding over the TF canvas, run a 5-conv stack, and project
            # patch-strided back to dembed_out per patch. Requires
            # dembed % dpatch == 0 (x = dembed/dpatch canvas channels).
            from ..ops.patches import patch_recover

            nb, npatch, _ = embed.shape
            nch = nreim * nmic
            f_first = self.patch_shape[1] != 1
            x = embed.reshape(nb, npatch, dpatch, self.dembed // dpatch)
            tf = patch_recover(x, (nf, nt), self.patch_shape,
                               f_first=f_first)              # (nb,nf,nt,x)
            if f_first:  # mirror the encoder's transposed-canvas convention
                tf = jnp.swapaxes(tf, 1, 2)
            bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                           momentum=0.9, epsilon=1e-5,
                                           dtype=self.dtype, name=name)
            conv = lambda feats, k, name: nn.Conv(
                feats, kernel_size=k, use_bias=False, dtype=self.dtype,
                name=name)
            y = nn.relu(bn("bn0")(conv(64, (1, 1), "conv0")(tf)))
            y = nn.relu(bn("bn1")(conv(64, (3, 3), "conv1")(y)))
            y = nn.relu(bn("bn2")(conv(64, (3, 3), "conv2")(y)))
            y = nn.relu(bn("bn3")(conv(nch, (1, 1), "conv3")(y)))
            pshape = (self.patch_shape[1], self.patch_shape[0]) if f_first \
                else self.patch_shape
            y = nn.Conv(dembed_out, kernel_size=pshape, strides=pshape,
                        use_bias=False, padding="VALID", dtype=self.dtype,
                        name="proj")(y)
            return y.reshape(nb, npatch, dembed_out)
        raise ValueError(f"Unsupported decoder head: {self.model[1]}")
