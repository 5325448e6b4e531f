"""Precision policy.

The reference trains in bf16 (`shell/train/stage1_train.sh:41 --bf16 True`)
with fp32 logits (`modeling_internlm2.py:1095-1096` casts the LM head output to
float) and fp32 norm statistics (`InternLM2RMSNorm.forward` upcasts to float32,
`modeling_internlm2.py:128-143`). On TPU the same policy is the MXU-optimal
one: bf16 params + activations feed the 128x128 systolic array at full rate;
accumulation in fp32 via `preferred_element_type`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32  # master params (optimizer in fp32)
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32  # norm statistics
    logits_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32  # matmul accumulation
    # W8A16 serving: LLM dense kernels stored as per-channel-symmetric int8
    # (tools/convert_to_int8.py format) and dequantized in-kernel right
    # before the MXU — halves weight streaming, the binding constraint of
    # autoregressive decode. Replaces the reference's bitsandbytes
    # load_in_8bit path (`internvl/model/__init__.py:32-44`).
    int8_weights: bool = False
    # W4A16 serving: nibble-packed int4 kernels unpacked in-kernel
    # (`ops/int8_matmul.int4_matmul`) — quarter weight-streaming bytes,
    # the `load_in_4bit` counterpart
    int4_weights: bool = False
    # int8 KV cache (`ops/kv_quant.py`): halves the per-sample cache
    # bytes/footprint at decode — the second bandwidth term after the
    # batch-amortized weight stream, and what bounds batch/context for
    # 7B-class serving on a 16 GB chip. No reference counterpart (HF fp16
    # past_key_values); composes with int8/int4 weights.
    kv_int8: bool = False
    # W8A8 serving: int8 x int8 -> int32 on the MXU via plain XLA
    # (`ops/w8a8.py`) — ~1.8x bf16 matmul throughput on v5e (measured,
    # benchmarks/int8_xla_probe.py). Weights per-channel int8 (same
    # checkpoint format as W8A16), activations quantized per token on the
    # fly. Applies to BOTH towers' dense layers (the compute-bound scoring
    # path), not the LM head (fp32 logits parity). Mutually exclusive with
    # int8_weights/int4_weights.
    w8a8: bool = False
    # Opt-in: W8A8 also covers the SlowFast pointwise (1,1,1) convs
    # (`models/motion._PointwiseConvW8A8`). Default OFF — measured
    # REFUTED on v5e: the motion branch is conv/bandwidth-bound, and the
    # on-the-fly quantize passes cost more than the int8 dots save
    # (25.6 ms vs 17.8 ms bf16 per bs=4 batch, benchmarks/persp_profile
    # round 5). Kept for parts where dense int8 is relatively cheaper.
    w8a8_motion: bool = False

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    @classmethod
    def bf16(cls) -> "Precision":
        return cls()

    @classmethod
    def int8(cls) -> "Precision":
        """bf16 activations over int8 LLM weights (serving)."""
        return cls(int8_weights=True)

    @classmethod
    def fp32(cls) -> "Precision":
        """Full fp32 (CPU tests / golden-value comparisons)."""
        return cls(compute_dtype=jnp.float32)


DEFAULT_PRECISION = Precision()
