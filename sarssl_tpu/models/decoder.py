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
        raise ValueError(f"Unsupported decoder head: {self.model[1]}")
