from .synthetic import SyntheticPairs, synth_batch
from .rooms import AcousticSamplerConfig, sample_acoustic_scene, MIC_ARRAY_2CH
from .scene import SceneSynthesizer
from .datasets import (FixMicSigDataset, FixMicSigDatasetLOCATA,
                       OnTheFlyMicSigDataset, RandomMixDataset, Segmenting,
                       Selecting, batch_iterator, mp_batch_iterator)
from .shards import PackedDataset, is_packed, pack_dataset, pack_wav_tree
from .wavio import read_wav, write_wav, read_audio, audio_info
from .real import (RealMicSigDataset, RandomRealDataset, CorpusSpec,
                   select_mic_pairs, ARRAY_GEOMETRIES, CORPUS_SPECS)
from .corpora import REAL_CORPORA, CorpusReader
from .real_rir import (NpyRIRDataset, SimRIRDataset, MicSigFromRIRDataset,
                       dp_from_rir)
from .sources import SpeakerTreeDataset
from .device_synth import DeviceSynthConfig, synth_batch_device
from .prefetch import device_prefetch

__all__ = [
    "RealMicSigDataset", "RandomRealDataset", "CorpusSpec",
    "select_mic_pairs", "ARRAY_GEOMETRIES", "CORPUS_SPECS",
    "NpyRIRDataset", "SimRIRDataset", "MicSigFromRIRDataset", "dp_from_rir",
    "SpeakerTreeDataset",
    "DeviceSynthConfig", "synth_batch_device", "device_prefetch",
    "SyntheticPairs", "synth_batch",
    "AcousticSamplerConfig", "sample_acoustic_scene", "MIC_ARRAY_2CH",
    "SceneSynthesizer",
    "FixMicSigDataset", "FixMicSigDatasetLOCATA", "OnTheFlyMicSigDataset",
    "RandomMixDataset", "Segmenting", "Selecting", "batch_iterator",
    "mp_batch_iterator",
    "PackedDataset", "is_packed", "pack_dataset", "pack_wav_tree",
    "read_wav", "write_wav", "read_audio", "audio_info",
    "REAL_CORPORA", "CorpusReader",
]
