"""Model loading for inference.

Equivalent of `/root/reference/internvl/model/__init__.py`
(`load_model_and_tokenizer`, lines 32-44, and `split_model`'s manual
device_map pipeline split, lines 8-29): on TPU the placement question
disappears into GSPMD — `load_model_and_tokenizer` loads config + params +
tokenizer and `shard_for_inference` lays the parameters over a mesh using
the same rules as training (fsdp/tensor axes) instead of round-robin layer
placement.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.data.tokenizer import AIGVTokenizer
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.parallel.sharding import shard_params


def load_model_and_tokenizer(
    path: str,
    stage: int = 2,
    precision: Optional[Precision] = None,
    int8: bool = False,
    int4: bool = False,
    kv_int8: bool = False,
    w8a8: bool = False,
) -> Tuple[AssessorConfig, AIGVAssessor, dict, AIGVTokenizer]:
    """Load (config, model, params, tokenizer) from a checkpoint directory
    containing config.json + params.msgpack + tokenizer.json.

    kv_int8: serve generation with an int8 KV cache (`ops/kv_quant.py`) —
    half the cache HBM bytes/footprint; composes with int8/int4 weights."""
    from aigv_assessor_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = AssessorConfig.from_json(os.path.join(path, "config.json"))
    config = config.replace(stage=stage)
    tokenizer = AIGVTokenizer.from_pretrained(path)
    config = config.replace(img_context_token_id=int(tokenizer.img_context_token_id))

    params_path = os.path.join(path, "params.msgpack")
    from flax import serialization

    with open(params_path, "rb") as f:
        params = serialization.msgpack_restore(f.read())

    # inference holds no fp32 masters (~halves weight HBM at 2B+ scales).
    # Quantize BEFORE casting, matching cli/common.build_serving_stack:
    # int8/int4 values come from the original fp32 weights (quantizing
    # bf16-rounded copies adds ~0.4% relative error on top of quantization),
    # and the cast skips the fresh fp32 dequant scales
    # (kernel_scale/kernel_scale4) so they stay full-precision.
    precision = precision or Precision()
    params, precision = quantize_for_serving(
        params, precision, int8=int8, int4=int4,
        kv_int8=kv_int8, w8a8=w8a8,
    )
    params = cast_params_for_inference(params, precision)
    model = AIGVAssessor(config, precision)
    params = adapt_layer_format(params, config)
    return config, model, params, tokenizer


def cast_params_for_inference(params, precision: Precision):
    """Cast fp32 master params to the compute dtype for inference-only use.

    Training holds fp32 masters (the optimizer needs them); serving/eval do
    not — the forward casts to bf16 anyway, so fp32 storage only doubles
    HBM (9.7 GB of masters at 2B pushed the fused 2-perspective eval to
    22.7 GB and OOM'd a 16 GB chip). Non-f32 leaves (int8/int4 kernels) and
    fp32 dequant scales (kernel_scale/kernel_scale4 — the int kernels need
    them full-precision) pass through untouched."""
    import jax.numpy as jnp
    from flax import traverse_util

    if precision.compute_dtype != jnp.bfloat16:
        return params

    flat = traverse_util.flatten_dict(params)
    out = {}
    for key, x in flat.items():
        if (
            str(key[-1]) not in ("kernel_scale", "kernel_scale4")
            and hasattr(x, "dtype")
            and x.dtype == jnp.float32
        ):
            x = x.astype(jnp.bfloat16)
        out[key] = x
    return traverse_util.unflatten_dict(out)


def quantize_for_serving(
    params,
    precision: Precision,
    int8: bool = False,
    int4: bool = False,
    kv_int8: bool = False,
    w8a8: bool = False,
) -> Tuple[dict, Precision]:
    """Convert a parameter tree and Precision for quantized serving.

    int4: W4A16 — keep (or create) nibble-packed int4 LLM kernels; the
    matmul unpacks in-kernel (`ops/int8_matmul.int4_matmul`). int8: W8A16.
    w8a8: int8 MXU compute for BOTH towers' dense layers (`ops/w8a8.py`,
    ~1.8x bf16 prefill/encode throughput on v5e) — LM head stays float.
    Neither: quantized checkpoints dequantize to the compute dtype. The
    TPU-native `load_in_8bit`/`load_in_4bit`
    (`/root/reference/internvl/model/__init__.py:32-44`)."""
    import dataclasses

    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    has_i8 = any(str(k[-1]) == "kernel_int8" for k in flat)
    has_i4 = any(str(k[-1]) == "kernel_int4" for k in flat)
    if w8a8:
        if int8 or int4:
            raise ValueError(
                "--w8a8 excludes --int8/--int4 weight streaming: w8a8 "
                "quantizes dense layers for int8 MXU compute, the others "
                "stream int8/int4 weights into bf16 compute"
            )
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree,
        )

        if has_i8 or has_i4:
            params = dequantize_tree(params)
        # wo/proj ride the dense int8 path since the attention kernels can
        # emit [B, S, H*D] directly (out_layout='bsd'); the head-major-IN
        # int8 einsum they previously needed measured 39.8 TOPS and kept
        # them bf16 through round 4. o_proj (Phi-3) still consumes
        # head-major and stays float; the LM head stays float for
        # fp32-logits parity
        params = quantize_tree(
            params,
            scope=("language_model", "vision_model"),
            exclude=("output", "o_proj"),
            only_base=True,
        )
        precision = dataclasses.replace(precision, w8a8=True)
        if kv_int8:
            precision = dataclasses.replace(precision, kv_int8=True)
        return params, precision
    if int4:
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree_int4,
            strip_int4_meta,
        )

        if has_i8:
            params = quantize_tree_int4(dequantize_tree(params))
        elif not has_i4:
            params = quantize_tree_int4(params)
        params = strip_int4_meta(params)
        precision = dataclasses.replace(precision, int4_weights=True)
    elif int8:
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree,
        )

        if has_i4:
            params = quantize_tree(dequantize_tree(params))
        elif not has_i8:
            params = quantize_tree(params)
        precision = dataclasses.replace(precision, int8_weights=True)
    elif has_i8 or has_i4:
        # quantized storage, full-precision serving: dequantize at load,
        # straight to the compute dtype (no fp32 copies to cast later)
        from aigv_assessor_tpu.tools.convert_to_int8 import dequantize_tree

        params = dequantize_tree(params, dtype=precision.compute_dtype)
    if kv_int8:
        precision = dataclasses.replace(precision, kv_int8=True)
    return params, precision


def adapt_layer_format(params, config: AssessorConfig):
    """Convert between unrolled `layers_{i}` checkpoints (torch-converted)
    and stacked `layers` trees (scan_layers) to match the model config,
    per tower."""
    from aigv_assessor_tpu.utils.stacking import (
        has_stacked_layers,
        has_unrolled_layers,
        stack_layer_params,
        unstack_layer_params,
    )

    def adapt(subtree, want_stacked: bool):
        if want_stacked and has_unrolled_layers(subtree):
            return stack_layer_params(subtree)
        if not want_stacked and has_stacked_layers(subtree):
            return unstack_layer_params(subtree)
        return subtree

    inner = params.get("params", params) if isinstance(params, dict) else params
    for name, want in (
        ("vision_model", config.vision.scan_layers),
        ("language_model", config.llm.scan_layers),
    ):
        if isinstance(inner, dict) and name in inner:
            inner[name] = adapt(inner[name], want)
    return params


def _has_int8(params) -> bool:
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    return any(str(k[-1]) in ("kernel_int8", "kernel_int4") for k in flat)


def shard_for_inference(
    params,
    mesh=None,
    mesh_config: Optional[MeshConfig] = None,
):
    """Place parameters on the mesh with the training sharding rules (the
    TPU replacement for `split_model`'s layer round-robin)."""
    mesh = mesh or make_mesh(mesh_config or MeshConfig.auto(fsdp=True))
    return mesh, shard_params(params, mesh)
