"""llamagen_tpu — a TPU-native two-stage autoregressive image generation framework.

Stage 1: VQ-VAE image tokenizer (`llamagen_tpu.models.vq`).
Stage 2: Llama-style decoder-only GPT over code grids (`llamagen_tpu.models.gpt`),
with a fully-jitted CFG sampling loop (`llamagen_tpu.ops.generate`), pjit-based
DP/FSDP/TP training and a slot-based continuous-batching serving engine.

Functionally equivalent to FoundationVision/LlamaGen (reference layout documented
in SURVEY.md) but designed TPU-first: NHWC convs, scan-over-layers transformers,
static-shape decode loops, mesh-sharded training, XLA collectives.
"""

__version__ = "0.1.0"
