from .stft import stft, istft, frame_signal, overlap_add, hann_window
from .patches import patch_split, patch_recover
from .mask import gen_patch_mask, T_MODE, T1S_MODE
from .pairs import mic_pair_rebatch, pair_unbatch
from .features import stft_features, FeatureConfig

__all__ = [
    "stft", "istft", "frame_signal", "overlap_add", "hann_window",
    "patch_split", "patch_recover",
    "gen_patch_mask", "T_MODE", "T1S_MODE",
    "mic_pair_rebatch", "pair_unbatch",
    "stft_features", "FeatureConfig",
]
