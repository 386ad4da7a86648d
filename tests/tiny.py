"""Shared tiny step profile for the compile-heavy training/parallel tests.

The flagship FeatureConfig (nfft 512 -> nf 256) forces every step test onto a
256-bin feature map, which dominates CPU compile AND execute time. This
profile shrinks the whole pipeline 4x (nfft 128 -> nf 64, 8 frames) while
keeping the structure identical: full-height (nf, 1) patches, both encoders,
pair rebatch, masked loss. All step tests build from these constants so
identical HLO dedups through the persistent compilation cache.
"""
from sarssl_tpu.models import SARSSLConfig
from sarssl_tpu.ops import FeatureConfig

NSAMPLE = 576          # (576 - 128) / 64 + 1 = 8 frames
FEAT = FeatureConfig(win_len=128, nfft=128)  # -> 64 used bins
CFG = SARSSLConfig().tiny(sig_shape=(64, 8, 2, 2), patch_shape=(64, 1),
                          spec_dembed=32, spat_dembed=16, num_heads=2)


def feat(**overrides) -> FeatureConfig:
    return FeatureConfig(win_len=128, nfft=128, **overrides)
