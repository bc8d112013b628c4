"""lhrs_bot_tpu — a TPU-native (JAX/XLA/Pallas/pjit) remote-sensing multimodal
LLM framework with the capabilities of NJU-LHRS/LHRS-Bot (ECCV 2024).

Components (see SURVEY.md for the reference inventory this mirrors):
  core/      config system, device mesh, dtype policy, checkpoint I/O
  ops/       Pallas TPU kernels + XLA reference implementations
  models/    ViT-L/14 vision tower, multi-level perceiver, LLaMA-2 decoder, VLM
  parallel/  sharding rules (data/tensor parallel) over jax.sharding.Mesh
  data/      conversation templates, tokenization/label masking, datasets
  train/     optax optimizers/schedules, hook-based trainer
  eval/      cls / vqa / vg / bench protocols
  serve/     prefill/decode generation engine, CLI chat
"""

__version__ = "0.1.0"
