"""domainrag_tpu — TPU-native retrieval-augmented compositional image generation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Domain-RAG reference pipeline (LiYu0524/Domain-RAG): foreground removal
(LaMa FFC inpainting), domain-aware two-stage retrieval (CLIP + ResNet-style
re-rank over sharded embedding banks), domain-guided background generation
(Flux-Redux dual-image prior + rectified-flow MMDiT), and foreground/background
composition (Flux-Fill outpainting) — designed TPU-first:

- compute path: jit-compiled XLA graphs, Pallas flash attention, fused
  GEMM+top-k retrieval kernels, bf16 on the MXU;
- scale-out: ``jax.sharding.Mesh`` + pjit/shard_map (data/model axes) instead
  of process-per-GPU shell jobs;
- orchestration: manifest-driven pipeline replacing the reference's
  ``domainrag.sh`` run-book and log-parsing resume.
"""

__version__ = "0.1.0"
