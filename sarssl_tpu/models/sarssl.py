"""SAR-SSL model: dual-encoder MC-Conformer with cross-channel masked
spectrogram reconstruction (pretext) and regression heads (downstream).

Behavioral equivalent of reference ``SARSSL`` (/root/reference/code/model.py:350-790),
re-designed for XLA:

  * masks are sampled OUTSIDE the module with keyed PRNG and passed in as
    boolean arrays, so the forward pass is a pure function;
  * the reference's per-item Python loops (PatchMask batch loop
    utils_module.py:263-270, gen_loss gather loop model.py:736-740) become
    broadcasted masked reductions with static masked-patch counts;
  * compute dtype is configurable (bf16 on TPU); losses accumulate in f32.

Masking semantics (model.py:539-565, exactly reproduced):
  spec-encoder input = masked-frames of the kept channel
                       + unmasked-frames of the masked channel;
  spat-encoder input = both channels on unmasked frames only;
  the decoder predicts all patches of all channels; the loss reads the masked
  channel on masked frames.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.patches import patch_split, patch_recover
from ..ops.mask import PatchMask
from .encoder import EmbedEncoder
from .decoder import EmbedDecoder


@dataclass(frozen=True)
class SARSSLConfig:
    sig_shape: Tuple[int, int, int, int] = (256, 256, 2, 2)  # (nf, nt, nreim, nmic)
    patch_shape: Tuple[int, int] = (256, 1)
    nmasked_patch: int = 128
    spec_dembed: int = 512
    spat_dembed: int = 256
    spec_layers: int = 1
    spat_layers: int = 3
    num_heads: int = 4
    local_model: str = "cnn"          # 'fc' | 'cnn' | 'cnn_f_first'
    global_model: str = "conformer"   # 'conformer' | 'transformer'
    dec_model: Tuple[str, str] = ("", "fc")
    dropout: float = 0.1
    pretrain: bool = True
    downstream_head: str = "mlp"
    downstream_embed: str = "spec_spat"  # 'spec_spat'|'spec'|'spat'|'noinfo'
    downstream_dlabel: int = 1
    frozen_encoder_pretext: bool = False  # reference model.py:603-666: the
    # spec encoder sees only unmasked frames of the kept channel
    in_ver: str = "separate"  # 'separate' | 'same' | 'single_ch_each_patch'
    # (model.py:380-382)
    remat_cnn: bool = False  # rematerialize the encoder CNN front-ends
    fused_attention: bool = False  # Pallas fused attention (no attn dropout)
    use_cls: bool = False
    downstream_token: str = "all"  # 'all' (mean of patches) | 'cls'
    dtype: str = "float32"

    @property
    def npatch(self) -> int:
        nf, nt, _, _ = self.sig_shape
        return (nf // self.patch_shape[0]) * (nt // self.patch_shape[1])

    @property
    def dpatch(self) -> int:
        return self.patch_shape[0] * self.patch_shape[1]

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def effective_nmasked(self) -> int:
        # the reference forces nmasked = npatch // 2 (model.py:361-364)
        return self.npatch // 2

    def tiny(self, **overrides) -> "SARSSLConfig":
        """Small config for tests/CI."""
        base = dict(
            sig_shape=(32, 16, 2, 2), patch_shape=(32, 1), nmasked_patch=8,
            spec_dembed=32, spat_dembed=16, spec_layers=1, spat_layers=1,
            num_heads=2,
        )
        base.update(overrides)
        return SARSSLConfig(**{**self.__dict__, **base})


class SARSSL(nn.Module):
    """Pretext + downstream SAR-SSL network."""

    cfg: SARSSLConfig

    def setup(self):
        c = self.cfg
        f_first = c.patch_shape[1] != 1
        local = "cnn_f_first" if (f_first and c.local_model == "cnn") else c.local_model
        dtype = c.compute_dtype
        if c.in_ver == "single_ch_each_patch":
            # each patch carries one channel; the encoder operates on a
            # doubled patch sequence with nmic=1 (reference model.py:452-456)
            nf, nt, nreim, nmic = c.sig_shape
            enc_sig_shape = (nf * nmic, nt, nreim, 1)
            enc_dembed_div = nmic
        else:
            enc_sig_shape = c.sig_shape
            enc_dembed_div = 1
        enc = lambda dembed, mode, layers: EmbedEncoder(
            sig_shape=enc_sig_shape, patch_shape=c.patch_shape,
            dembed=dembed // enc_dembed_div,
            model=(local, c.global_model), mode=mode, num_layers=layers,
            dropout=c.dropout,
            use_cls=c.use_cls, remat_local=c.remat_cnn,
            fused_attention=c.fused_attention, dtype=dtype,
        )
        self.spec_encoder = enc(c.spec_dembed, "spec", c.spec_layers)
        self.spat_encoder = enc(c.spat_dembed, "spat", c.spat_layers)
        if c.pretrain:
            self.decoder = EmbedDecoder(
                sig_shape=c.sig_shape, patch_shape=c.patch_shape,
                dembed=c.spec_dembed + c.spat_dembed, model=c.dec_model,
                dropout=c.dropout, dtype=dtype,
            )
        else:
            if c.downstream_head == "mlp":
                dembed_ds = {
                    "spec_spat": c.spec_dembed + c.spat_dembed,
                    "spec": c.spec_dembed,
                    "spat": c.spat_dembed,
                    "noinfo": c.spec_dembed,
                }[c.downstream_embed]
                if c.downstream_dlabel == 1:
                    self.head_norm = nn.LayerNorm(dtype=dtype)
                    self.head_proj = nn.Dense(1, dtype=dtype)
                else:
                    self.head_norm = nn.LayerNorm(dtype=dtype)
                    self.head_hidden = nn.Dense(dembed_ds, dtype=dtype)
                    self.head_proj = nn.Dense(c.downstream_dlabel, dtype=dtype)

    def _split(self, x):
        # x: (nb, nmic, nf, nt, nreim) -> patches (nb, npatch, dpatch, nreim, nmic)
        data = jnp.transpose(x, (0, 2, 3, 4, 1))
        return patch_split(data, self.cfg.patch_shape,
                           f_first=self.cfg.patch_shape[1] != 1)

    def __call__(self, x, mask: Optional[PatchMask] = None, train: bool = False):
        if self.cfg.pretrain:
            assert mask is not None, "pretext forward needs a PatchMask"
            return self.pretext(x, mask, train)
        return self.downstream(x, train)

    def pretext(self, x, mask: PatchMask, train: bool = False):
        """Masked cross-channel reconstruction. Returns (loss, diff, aux)."""
        c = self.cfg
        nb, nmic = x.shape[0], x.shape[1]
        vec = self._split(x)  # (nb, npatch, dpatch, nreim, nmic)
        npatch, dpatch = vec.shape[1], vec.shape[2]
        dtype = c.compute_dtype

        masked = mask.patch.astype(dtype)[:, :, None, None, None]       # 1 = masked frame
        masked_ch = jax.nn.one_hot(mask.ch, nmic, dtype=dtype)[:, None, None, None, :]
        kept_ch = 1.0 - masked_ch

        vecc = vec.astype(dtype)
        if c.in_ver == "single_ch_each_patch":
            # one channel per patch: doubled patch sequence, features
            # re-joined across mics afterwards (model.py:567-573)
            both = vecc * (1.0 - masked * masked_ch)
            per_mic = jnp.concatenate(
                [both[..., m] for m in range(nmic)], axis=1)
            flat = per_mic.reshape(nb, npatch * nmic, -1)
            es = self.spec_encoder(flat, train)
            ea = self.spat_encoder(flat, train)
            join = lambda e: jnp.concatenate(
                [e[:, m * npatch:(m + 1) * npatch] for m in range(nmic)],
                axis=2)
            embed_spec, embed_spat = join(es), join(ea)
        else:
            if c.in_ver == "same":
                # single-channel masking applied identically to both encoders
                # (model.py:575-578)
                both = vecc * (1.0 - masked * masked_ch)
                spec_in, spat_in = both, both
            elif c.frozen_encoder_pretext:
                # frozen-encoder decoder retraining (model.py:622-631): spec
                # encoder sees only the masked frames of the kept channel
                spec_in = vecc * masked * kept_ch
                spat_in = vecc * (1.0 - masked)
            else:  # 'separate' (default)
                spec_in = (vecc * masked * kept_ch
                           + vecc * (1.0 - masked) * masked_ch)
                spat_in = vecc * (1.0 - masked)
            embed_spec = self.spec_encoder(spec_in.reshape(nb, npatch, -1),
                                           train)
            embed_spat = self.spat_encoder(spat_in.reshape(nb, npatch, -1),
                                           train)
        if c.use_cls:  # drop the CLS token for reconstruction
            embed_spec = embed_spec[:, :npatch]
            embed_spat = embed_spat[:, :npatch]
        embed = jnp.concatenate([embed_spec, embed_spat], axis=2)
        pred = self.decoder(embed, train)  # (nb, npatch, dpatch*nreim*nmic)
        pred = pred.reshape(nb, npatch, dpatch, 2, nmic)

        # loss on masked channel, masked frames only (model.py:585-592,721-747)
        pred_m = jnp.sum(pred.astype(jnp.float32) * masked_ch, axis=-1)
        tar_m = jax.lax.stop_gradient(jnp.sum(vec * masked_ch, axis=-1))
        tar_k = jax.lax.stop_gradient(jnp.sum(vec * kept_ch, axis=-1))

        w = mask.patch.astype(jnp.float32)[:, :, None, None]  # (nb, npatch,1,1)
        denom = jnp.sum(mask.patch) * dpatch * 2
        loss = jnp.sum(((pred_m - tar_m) ** 2) * w) / denom
        diff = jnp.sum(((tar_m - tar_k) ** 2) * w) / denom

        aux = {"pred": pred, "tar": vec, "mask": mask}
        return loss, diff, aux

    def embed(self, x, train: bool = False):
        """Unmasked dual-encoder embeddings, mean-pooled over patches."""
        c = self.cfg
        nb = x.shape[0]
        vec = self._split(x).astype(c.compute_dtype)
        npatch = vec.shape[1]
        if c.in_ver == "single_ch_each_patch":
            nmic = vec.shape[-1]
            per_mic = jnp.concatenate(
                [vec[..., m] for m in range(nmic)], axis=1)
            flat = per_mic.reshape(nb, npatch * nmic, -1)
            join = lambda e: jnp.concatenate(
                [e[:, m * npatch:(m + 1) * npatch] for m in range(nmic)],
                axis=2)
            embed_spec = join(self.spec_encoder(flat, train))
            embed_spat = join(self.spat_encoder(flat, train))
        else:
            flat = vec.reshape(nb, npatch, -1)
            embed_spec = self.spec_encoder(flat, train)
            embed_spat = self.spat_encoder(flat, train)
        if c.downstream_embed == "spec_spat":
            embed = jnp.concatenate([embed_spec, embed_spat], axis=2)
        elif c.downstream_embed == "spec":
            embed = embed_spec
        elif c.downstream_embed == "spat":
            embed = embed_spat
        elif c.downstream_embed == "noinfo":
            embed = jax.lax.stop_gradient(jnp.zeros_like(embed_spec))
        else:
            raise ValueError(c.downstream_embed)
        if c.use_cls:
            if c.downstream_token == "cls":
                return embed[:, -1]          # (nb, dembed_ds)
            embed = embed[:, :-1]            # 'all': mean over patch tokens
        return jnp.mean(embed, axis=1)  # (nb, dembed_ds)

    def downstream(self, x, train: bool = False):
        """Regression head. Returns (pred (nb, dlabel), embed (nb, dembed))."""
        pooled = self.embed(x, train)
        y = self.head_norm(pooled)
        if self.cfg.downstream_dlabel != 1:
            y = nn.relu(self.head_hidden(y))
        pred = self.head_proj(y)
        return pred.astype(jnp.float32), pooled


class MCConformer(nn.Module):
    """Supervised encoder-decoder (no masking), reference model.py:824-912."""

    cfg: SARSSLConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        nb, nmic = x.shape[0], x.shape[1]
        data = jnp.transpose(x, (0, 2, 3, 4, 1))
        f_first = c.patch_shape[1] != 1
        vec = patch_split(data, c.patch_shape, f_first=f_first)
        npatch, dpatch = vec.shape[1], vec.shape[2]
        flat = vec.reshape(nb, npatch, -1).astype(c.compute_dtype)

        local = "cnn_f_first" if (f_first and c.local_model == "cnn") else c.local_model
        embeds = []
        if c.spec_dembed > 0:
            embeds.append(EmbedEncoder(
                sig_shape=c.sig_shape, patch_shape=c.patch_shape,
                dembed=c.spec_dembed, model=(local, c.global_model), mode="spec",
                dropout=c.dropout, dtype=c.compute_dtype, name="spec_encoder",
            )(flat, train))
        if c.spat_dembed > 0:
            embeds.append(EmbedEncoder(
                sig_shape=c.sig_shape, patch_shape=c.patch_shape,
                dembed=c.spat_dembed, model=(local, c.global_model), mode="spat",
                dropout=c.dropout, dtype=c.compute_dtype, name="spat_encoder",
            )(flat, train))
        embed = embeds[0] if len(embeds) == 1 else jnp.concatenate(embeds, axis=2)

        pred = EmbedDecoder(
            sig_shape=c.sig_shape, patch_shape=c.patch_shape,
            dembed=c.spec_dembed + c.spat_dembed, model=c.dec_model,
            dropout=c.dropout, dtype=c.compute_dtype, name="decoder",
        )(embed, train)
        pred = pred.reshape(nb, npatch, dpatch, 2, nmic)
        return patch_recover(pred, (c.sig_shape[0], c.sig_shape[1]),
                             c.patch_shape, f_first=f_first)


class SARSSLMultiCH(nn.Module):
    """Multi-pair wrapper: shared single-pair trunk + joint MLP head
    (reference model.py:793-821)."""

    cfg: SARSSLConfig
    nmic_pair: int
    task: str = "TDOA"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: (nb*nmic_pair, 2, nf, nt, nreim); mask unused (downstream-only
        # trunk) but kept so step/init signatures match SARSSL
        c = self.cfg
        trunk_cfg = SARSSLConfig(**{**c.__dict__, "pretrain": False,
                                    "downstream_embed": "spat"})
        trunk = SARSSL(trunk_cfg, name="model_sch")
        pooled = trunk.embed(x, train)  # (nb*nmic_pair, spat_dembed)
        nembed = pooled.shape[-1]
        joint = pooled.reshape(-1, self.nmic_pair * nembed)
        dlabel = self.nmic_pair if self.task == "TDOA" else 1
        y = nn.LayerNorm(dtype=c.compute_dtype)(joint)
        y = nn.relu(nn.Dense(self.nmic_pair * nembed, dtype=c.compute_dtype)(y))
        pred = nn.Dense(dlabel, dtype=c.compute_dtype)(y)
        return pred.astype(jnp.float32), joint
