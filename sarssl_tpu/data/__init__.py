from .synthetic import SyntheticPairs, synth_batch
from .rooms import AcousticSamplerConfig, sample_acoustic_scene, MIC_ARRAY_2CH
from .scene import SceneSynthesizer
from .datasets import (FixMicSigDataset, OnTheFlyMicSigDataset, Selecting,
                       batch_iterator)
from .wavio import read_wav, write_wav

__all__ = [
    "SyntheticPairs", "synth_batch",
    "AcousticSamplerConfig", "sample_acoustic_scene", "MIC_ARRAY_2CH",
    "SceneSynthesizer",
    "FixMicSigDataset", "OnTheFlyMicSigDataset", "Selecting", "batch_iterator",
    "read_wav", "write_wav",
]
