"""climb_tpu — a TPU-native rebuild of the capabilities of GLAMOR-USC/CLiMB.

CLiMB (Continual Learning in Multimodality Benchmark) trains a
vision-and-language encoder on a sequence of multimodal tasks
(VQAv2 -> NLVR2 -> SNLI-VE -> VCR) under a continual-learning algorithm and
evaluates upstream knowledge transfer, catastrophic forgetting, and low-shot
downstream transfer (multimodal, language-only, vision-only).

This package re-designs the whole stack TPU-first on JAX/XLA/Flax/Pallas:

- ``climb_tpu.models``   — Flax ViLT / ViLT-BERT encoders, task heads, adapters,
  HF weight import (reference: ``src/modeling/``).
- ``climb_tpu.ops``      — Pallas TPU kernels (fused attention, bias-GELU MLP,
  patch embedding, image normalize) with XLA reference implementations.
- ``climb_tpu.parallel`` — device mesh, sharding rules, collectives
  (the reference is single-device; this is the TPU scaling layer).
- ``climb_tpu.data``     — ahead-of-time, fixed-shape host input pipeline
  (reference: ``src/data/``).
- ``climb_tpu.train``    — one jitted train-step transform + task trainers
  (reference: ``src/train/``).
- ``climb_tpu.cl``       — continual-learning algorithms as train-step
  transforms (reference: ``src/cl_algorithms/``).
- ``climb_tpu.evaluation`` — transfer/forgetting metrics & result tables
  (reference: ``src/cl_evaluation/``).
- ``climb_tpu.ckpt``     — task-granular checkpointing, encoder-only export.
- ``climb_tpu.cli``      — drivers with the reference's CLI flag surface.
"""

__version__ = "0.1.0"
