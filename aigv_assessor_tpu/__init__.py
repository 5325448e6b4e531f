"""AIGV-Assessor-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video quality assessment
framework for AI-generated videos.

Re-implements the full capability surface of the reference AIGV-Assessor
(wangjiarui153/AIGV-Assessor, CVPR 2025) — InternViT-300M vision encoder,
InternLM2 decoder, SlowFast motion branch, spatiotemporal projection, quality-
level text training (stage 1) and MOS score regression with LoRA (stage 2) —
redesigned from scratch for TPUs: bf16 MXU compute, Pallas flash-attention,
GSPMD sharding over a (data, fsdp, tensor) mesh, orbax checkpointing.
"""

__version__ = "0.1.0"

from aigv_assessor_tpu.core.config import (  # noqa: F401
    AssessorConfig,
    LLMConfig,
    VisionConfig,
)
