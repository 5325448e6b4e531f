"""Shared CLI assembly: config -> model -> params -> tokenizer.

Covers the model-assembly section of the reference entry points
(`stage1_train.py:802-883`): load a combined checkpoint, or assemble from
separate vision/llm/mlp paths, resize pos-embeddings for a non-448 input
size, and wire the img_context token id from the tokenizer
(`stage1_train.py:799`).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aigv_assessor_tpu.core.config import AssessorConfig, LLMConfig
from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.data.tokenizer import AIGVTokenizer, build_test_tokenizer
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.train.checkpoint import load_params

logger = logging.getLogger(__name__)

# InternVL2-2B class: InternViT-300M + InternLM2-1.8B (BASELINE.md config #1)
LLM_2B = LLMConfig(
    vocab_size=92553,
    hidden_size=2048,
    intermediate_size=8192,
    num_hidden_layers=24,
    num_attention_heads=16,
    num_key_value_heads=8,
)


def config_from_args(args, stage: int) -> AssessorConfig:
    ckpt_config = os.path.join(args.model_name_or_path or "", "config.json")
    if args.model_name_or_path and os.path.exists(ckpt_config):
        cfg = AssessorConfig.from_json(ckpt_config)
    elif args.model_scale == "tiny":
        cfg = AssessorConfig.tiny()
    elif args.model_scale == "2b":
        cfg = AssessorConfig(llm=LLM_2B)
    else:
        cfg = AssessorConfig()  # 8B default
    cfg = cfg.replace(
        stage=stage,
        downsample_ratio=args.down_sample_ratio,
        ps_version=args.ps_version,
        select_layer=args.vision_select_layer,
        template=args.conv_style,
        max_dynamic_patch=args.max_dynamic_patch,
        min_dynamic_patch=args.min_dynamic_patch,
        dynamic_image_size=args.dynamic_image_size,
        use_thumbnail=args.use_thumbnail,
        pad2square=args.pad2square,
        use_backbone_lora=args.use_backbone_lora,
        use_llm_lora=args.use_llm_lora,
    )
    import dataclasses

    cfg = cfg.replace(
        vision=dataclasses.replace(cfg.vision, drop_path_rate=args.drop_path_rate)
    )
    if args.model_scale != "tiny":
        cfg = cfg.replace(force_image_size=args.force_image_size)
    return cfg


def load_tokenizer(args, config: AssessorConfig) -> AIGVTokenizer:
    path = args.model_name_or_path or ""
    # from_pretrained resolves tokenizer.json OR the sentencepiece
    # tokenizer.model (the format real InternLM2/InternVL2 checkpoints
    # ship); fall back to the built-in test tokenizer only when the
    # checkpoint has neither
    if path and (
        os.path.exists(os.path.join(path, "tokenizer.json"))
        or os.path.exists(os.path.join(path, "tokenizer.model"))
    ):
        tok = AIGVTokenizer.from_pretrained(
            path, model_max_length=args.max_seq_length
        )
    else:
        logger.warning(
            "no tokenizer.json/tokenizer.model found; using built-in test "
            "tokenizer"
        )
        tok = build_test_tokenizer(model_max_length=args.max_seq_length)
    return tok


def init_or_load_params(
    model: AIGVAssessor, args, config: AssessorConfig, seed: int = 0
) -> Any:
    """Load params.msgpack from the checkpoint dir, else random-init."""
    example_seq = 64
    example = dict(
        input_ids=jnp.zeros((1, example_seq), jnp.int32),
        pixel_values=jnp.zeros(
            (1, 4, *_image_hw(config), 3), jnp.float32
        ),
    )
    params = jax.eval_shape(
        lambda: model.init(
            jax.random.key(seed), example["input_ids"], example["pixel_values"]
        )
    )
    ckpt = os.path.join(args.model_name_or_path or "", "params.msgpack")
    if args.model_name_or_path and os.path.exists(ckpt):
        logger.info("loading params from %s", ckpt)
        params = load_params(ckpt, jax.tree_util.tree_map(np.zeros_like, params))
    else:
        logger.info("initializing params from scratch (seed %d)", seed)
        params = model.init(
            jax.random.key(seed), example["input_ids"], example["pixel_values"]
        )
    return _graft_subcheckpoints(params, args)


def _graft_subcheckpoints(params: Any, args) -> Any:
    """Assemble from separate vision/llm/mlp artifacts (reference model
    assembly from --vision_path/--llm_path/--mlp_path,
    `stage1_train.py:821-858`)."""
    from flax import serialization

    def load_part(path):
        with open(path, "rb") as f:
            t = serialization.msgpack_restore(f.read())
        return t.get("params", t)

    tree = params["params"] if "params" in params else params
    if getattr(args, "vision_path", None):
        part = load_part(args.vision_path)
        tree["vision_model"] = part.get("vision_model", part)
        logger.info("grafted vision tower from %s", args.vision_path)
    if getattr(args, "llm_path", None):
        part = load_part(args.llm_path)
        tree["language_model"] = part.get("language_model", part)
        logger.info("grafted language model from %s", args.llm_path)
    if getattr(args, "mlp_path", None):
        part = load_part(args.mlp_path)
        tree["mlp1"] = part.get("mlp1", part)
        if part.get("motion_mlp") is not None:
            tree["motion_mlp"] = part["motion_mlp"]
        logger.info("grafted mlp projector from %s", args.mlp_path)
    return params


def _image_hw(config: AssessorConfig) -> Tuple[int, int]:
    s = config.force_image_size or config.vision.image_size
    return (s, s)


def build_model_and_tokenizer(args, stage: int):
    # all six CLIs assemble through here: reuse compiled XLA programs across
    # process starts (AIGV_COMPILE_CACHE=0 disables)
    from aigv_assessor_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = config_from_args(args, stage)
    tokenizer = load_tokenizer(args, config)
    ctx_id = tokenizer.img_context_token_id
    config = config.replace(img_context_token_id=int(ctx_id))
    precision = Precision() if args.bf16 else Precision.fp32()
    model = AIGVAssessor(
        config, precision, remat=bool(getattr(args, "grad_checkpoint", False)),
        vit_remat_policy=getattr(args, "vit_remat_policy", None) or None,
    )
    params = init_or_load_params(model, args, config, seed=args.seed)
    return config, model, params, tokenizer


def build_serving_stack(
    model_name_or_path: str = "",
    model_scale: str = "auto",
    max_seq_length: int = 4096,
    bf16: bool = True,
    int8: bool = False,
    int4: bool = False,
    kv_int8: bool = False,
    w8a8: bool = False,
    stage: int = 2,
):
    """(config, model, params, tokenizer) for the serving CLIs (score/serve):
    the training CLI assembly with inference defaults, plus the quantized
    serving transforms. Tiny random fallback when no checkpoint is given."""
    from types import SimpleNamespace

    asm_args = SimpleNamespace(
        model_name_or_path=model_name_or_path,
        model_scale=model_scale,
        max_seq_length=max_seq_length,
        bf16=bf16,
        seed=0,
        down_sample_ratio=0.5,
        ps_version="v2",
        vision_select_layer=-1,
        conv_style="internlm2-chat",
        max_dynamic_patch=6,
        min_dynamic_patch=1,
        dynamic_image_size=True,
        use_thumbnail=True,
        pad2square=False,
        use_backbone_lora=0,
        use_llm_lora=0,
        drop_path_rate=0.0,
        force_image_size=448,
        grad_checkpoint=False,
        vision_path=None,
        llm_path=None,
        mlp_path=None,
    )
    # Materialize params ON THE HOST: checkpoint load / random init /
    # quantization are host work, and running them through the accelerator
    # round-trips the full fp32 tree (init RNG programs + ~8 GB d2h + h2d
    # at 2B). On a tunneled chip that made cold start 10-30+ min; host
    # init + ONE push of the final (quantized, bf16-cast) tree is minutes
    # and tunnel-proof. Serving fleets restart often — cold start is a
    # first-class metric (see also core/compile_cache.py).
    cpu = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else None
    import contextlib

    from aigv_assessor_tpu.core import compile_cache

    # the persistent cache must not see these one-shot CPU init programs:
    # XLA:CPU AOT entries can fail the loader's machine-feature check on
    # reload (see compile_cache.py) — suspend reads AND writes
    if cpu is not None and bf16:
        # XLA:CPU has no bf16 dot path (DotThunk BF16xBF16 unimplemented):
        # materialize params at fp32 — the param TREE is precision-
        # independent (param_dtype fp32 everywhere, same init RNG) — and
        # swap the serving-precision model back in below.
        asm_args.bf16 = False
    with (jax.default_device(cpu) if cpu is not None
          else contextlib.nullcontext()), (
          compile_cache.suspended() if cpu is not None
          else contextlib.nullcontext()):
        config, model, params, tokenizer = build_model_and_tokenizer(
            asm_args, stage=stage
        )
        if cpu is not None and bf16:
            model = AIGVAssessor(config, Precision())
        from aigv_assessor_tpu.models.loading import cast_params_for_inference

        # quantize from the fp32 originals first (bf16-rounding before
        # quantization adds ~0.4% rel err), then drop the fp32 masters:
        # serving holds none — ~halves weight HBM (9.7 GB at 2B). The cast
        # skips the fp32 dequant scales.
        precision = model.precision
        if int8 or int4 or kv_int8 or w8a8:
            from aigv_assessor_tpu.models.loading import quantize_for_serving

            params, precision = quantize_for_serving(
                params, precision, int8=int8, int4=int4, kv_int8=kv_int8,
                w8a8=w8a8,
            )
            model = AIGVAssessor(config, precision)
        params = cast_params_for_inference(params, precision)
    if cpu is not None:
        params = jax.device_put(params, jax.devices()[0])
        jax.block_until_ready(params)
    return config, model, params, tokenizer


def mesh_from_args(args):
    n = jax.device_count()
    data = args.mesh_data or max(1, n // (args.mesh_fsdp * args.mesh_tensor))
    return make_mesh(MeshConfig(data=data, fsdp=args.mesh_fsdp, tensor=args.mesh_tensor))


def compute_shared_prefix_len(
    prompts,
    img_context_token_id: int,
    *,
    min_prefix: int = 8,
    min_suffix: int = 4,
) -> int:
    """Longest common token prefix across perspective prompts, or 0 when
    shared-prefix scoring can't use it.

    The guard (shared by cli/score.py, cli/serve.py and the fused eval in
    train/evaluate.py): the prefix must be non-trivial, must contain EVERY
    <IMG_CONTEXT> token (the frame/motion splice runs only in the prefix
    prefill), and every perspective needs at least `min_suffix` suffix
    tokens so the hidden[-4] score read-out lands inside its own suffix
    block."""
    if len(prompts) < 2:
        return 0
    prefix_len = min(len(p) for p in prompts)
    first = prompts[0]
    for p in prompts[1:]:
        i = 0
        while i < prefix_len and p[i] == first[i]:
            i += 1
        prefix_len = min(prefix_len, i)
    ctx = np.nonzero(np.asarray(first) == img_context_token_id)[0]
    if (
        prefix_len < min_prefix
        or ctx.size == 0
        or int(ctx.max()) >= prefix_len
        or min(len(p) for p in prompts) - prefix_len < min_suffix
    ):
        return 0
    return prefix_len
