"""SAR-SSL / TPU: a TPU-native JAX framework for self-supervised learning of
spatial acoustic representations.

Re-implements the capabilities of Audio-WestlakeU/SAR-SSL (TASLP 2024) as an
idiomatic JAX/XLA/Pallas stack: fused STFT feature extraction, vectorized
cross-channel masking, an MC-Conformer model family, a pjit/shard_map
data-parallel training runtime, and a room-acoustics data-generation engine.

Subpackages
-----------
ops       Pure-function DSP primitives (STFT, patches, masks, mic pairs).
models    Flax model family (MC-Conformer, SARSSL pretext/downstream heads).
train     Training runtime: jitted steps, schedules, checkpoints, loops.
parallel  Device meshes, shardings, multi-chip step construction.
data      Room simulation (image-source RIRs), noise synthesis, datasets.
utils     Seeding, logging, metrics.
cli       run_pretrain / run_downstream / gen_simu entry points.
kernels   Pallas TPU kernels for hot ops.
"""

__version__ = "0.1.0"
