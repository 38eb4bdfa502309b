"""audiossl_tpu — TPU-native audio self-supervised-learning framework.

A ground-up JAX/Flax/optax/Pallas rebuild of the LAPE audio-SSL stack
(reference: Sreyan88/audio-ssl). The compute path (log-mel frontend,
spectrogram augmentations, conv/transformer encoders, SSL objectives) runs
as a single jitted XLA program per train step, data-parallel over a
`jax.sharding.Mesh` with explicit collectives (psum / all_gather) instead of
NCCL/DDP.

Layout:
  frontend/    waveform -> log-mel / fbank (fused Pallas kernel + XLA path)
  ops/         jittable building blocks (resize, windowing, running stats)
  data/        CSV manifests, WAV decode, host->device input pipeline
  models/      Flax encoders (AudioNTT, EfficientNet, MViTv2/MAST)
  objectives/  SSL objectives (DeLoRes-S/M, SLICER, DECAR, UnFuSeD, SS-MAST)
  parallel/    mesh + collective helpers
  train/       train state, jitted step, optimizers, checkpointing
  downstream/  linear probe + LAPE task suite
  utils/       metrics (accuracy/mAP/CKA/NMI), logging
"""

__version__ = "0.1.0"
