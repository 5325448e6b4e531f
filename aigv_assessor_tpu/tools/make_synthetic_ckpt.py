"""Generate a synthetic reference-format checkpoint for converter tests.

Real InternVL2/AIGV-Assessor checkpoints ship as sharded safetensors
(`model-0000x-of-0000y.safetensors` + `model.safetensors.index.json`) with
the torch module names of the composite model
(`/root/reference/internvl/model/internvl_chat_stage2_lora/modeling_internvl_chat.py:176-306`).
Real weights are not redistributable (and would be 16 GB); this tool emits a
checkpoint with the SAME key names, orientations, and file format at the
tiny config scale with random values, so the converter pipeline
(`convert_weights.py` -> `load_model_and_tokenizer` -> forward) can be
driven end-to-end in CI. A drift in any key name, fusion layout (interleaved
wqkv), or kernel orientation breaks the round-trip test
(`tests/test_safetensors_e2e.py`).

Usage:
  python -m aigv_assessor_tpu.tools.make_synthetic_ckpt --out ckpt_dir \
      [--shards 2] [--seed 0] [--no-slowfast]
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Dict, List, Tuple

import numpy as np

from aigv_assessor_tpu.core.config import AssessorConfig


def reference_state_dict(
    cfg: AssessorConfig, rng: np.random.Generator
) -> Dict[str, np.ndarray]:
    """Reference-named torch-orientation tensors for `cfg` (everything but
    the SlowFast branch — see `slowfast_state_dict`): ViT encoder, InternLM2
    decoder with the INTERLEAVED fused wqkv (`modeling_internlm2.py:375-385`),
    mlp1/motion_mlp projectors (torch Sequential 0/1/3 indices), mlpscore."""
    v, l = cfg.vision, cfg.llm
    sd: Dict[str, np.ndarray] = {}

    def r(*shape):
        return rng.normal(scale=0.02, size=shape).astype(np.float32)

    # ---- vision (modeling_intern_vit.py module names) ----
    sd["vision_model.embeddings.class_embedding"] = r(1, 1, v.hidden_size)
    sd["vision_model.embeddings.position_embedding"] = r(
        1, v.num_patches + 1, v.hidden_size
    )
    sd["vision_model.embeddings.patch_embedding.weight"] = r(
        v.hidden_size, 3, v.patch_size, v.patch_size
    )
    sd["vision_model.embeddings.patch_embedding.bias"] = r(v.hidden_size)
    for i in range(v.num_hidden_layers):
        p = f"vision_model.encoder.layers.{i}."
        sd[p + "attn.qkv.weight"] = r(3 * v.hidden_size, v.hidden_size)
        sd[p + "attn.qkv.bias"] = r(3 * v.hidden_size)
        sd[p + "attn.proj.weight"] = r(v.hidden_size, v.hidden_size)
        sd[p + "attn.proj.bias"] = r(v.hidden_size)
        sd[p + "mlp.fc1.weight"] = r(v.intermediate_size, v.hidden_size)
        sd[p + "mlp.fc1.bias"] = r(v.intermediate_size)
        sd[p + "mlp.fc2.weight"] = r(v.hidden_size, v.intermediate_size)
        sd[p + "mlp.fc2.bias"] = r(v.hidden_size)
        sd[p + "norm1.weight"] = r(v.hidden_size)
        sd[p + "norm1.bias"] = r(v.hidden_size)
        sd[p + "norm2.weight"] = r(v.hidden_size)
        sd[p + "norm2.bias"] = r(v.hidden_size)
        sd[p + "ls1"] = r(v.hidden_size)
        sd[p + "ls2"] = r(v.hidden_size)
    # ---- llm (interleaved wqkv like the reference checkpoint) ----
    sd["language_model.model.tok_embeddings.weight"] = r(l.vocab_size, l.hidden_size)
    sd["language_model.model.norm.weight"] = r(l.hidden_size)
    sd["language_model.output.weight"] = r(l.vocab_size, l.hidden_size)
    for i in range(l.num_hidden_layers):
        p = f"language_model.model.layers.{i}."
        g = l.num_key_value_groups
        sd[p + "attention.wqkv.weight"] = r(
            l.num_key_value_heads * (g + 2) * l.head_dim, l.hidden_size
        )
        sd[p + "attention.wo.weight"] = r(l.hidden_size, l.hidden_size)
        sd[p + "feed_forward.w1.weight"] = r(l.intermediate_size, l.hidden_size)
        sd[p + "feed_forward.w3.weight"] = r(l.intermediate_size, l.hidden_size)
        sd[p + "feed_forward.w2.weight"] = r(l.hidden_size, l.intermediate_size)
        sd[p + "attention_norm.weight"] = r(l.hidden_size)
        sd[p + "ffn_norm.weight"] = r(l.hidden_size)
    # ---- projectors + score head (torch Sequential indices 0/1/3) ----
    vit4 = v.hidden_size * 4
    sd["mlp1.0.weight"] = r(vit4)
    sd["mlp1.0.bias"] = r(vit4)
    sd["mlp1.1.weight"] = r(l.hidden_size, vit4)
    sd["mlp1.1.bias"] = r(l.hidden_size)
    sd["mlp1.3.weight"] = r(l.hidden_size, l.hidden_size)
    sd["mlp1.3.bias"] = r(l.hidden_size)
    sd["motion_mlp.0.weight"] = r(cfg.motion.feature_dim)
    sd["motion_mlp.0.bias"] = r(cfg.motion.feature_dim)
    sd["motion_mlp.1.weight"] = r(l.hidden_size, cfg.motion.feature_dim)
    sd["motion_mlp.1.bias"] = r(l.hidden_size)
    sd["motion_mlp.3.weight"] = r(l.hidden_size, l.hidden_size)
    sd["motion_mlp.3.bias"] = r(l.hidden_size)
    if cfg.stage >= 2:
        dims = (cfg.llm.hidden_size,) + cfg.score_head_dims
        for i in range(len(cfg.score_head_dims)):
            sd[f"mlpscore.fc{i + 1}.weight"] = r(dims[i + 1], dims[i])
            sd[f"mlpscore.fc{i + 1}.bias"] = r(dims[i + 1])
    return sd


# --------------------------------------------------------------- slowfast --

_BN_LEAF_INV = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def flax_slowfast_path_to_torch(path: Tuple[str, ...]) -> str:
    """Inverse of `convert_weights.map_slowfast_key`: a flax param path in
    this repo's SlowFastR50 tree -> the pytorchvideo name the reference's
    wrapper exposes (`slowfast_model.feature_extraction.{block}...`)."""
    top = path[0]

    def bn_or_conv(rest: Tuple[str, ...], conv_name: str, norm_name: str) -> str:
        # rest is ('conv', 'kernel') | ('bn', leaf)
        if rest[0] == "conv":
            return f"{conv_name}.weight"
        return f"{norm_name}.{_BN_LEAF_INV[rest[1]]}"

    m = re.match(r"(slow|fast)_stem$", top)
    if m:
        pw = 0 if m.group(1) == "slow" else 1
        # path = (stem, 'conv', 'conv'|'bn', leaf); inner ConvBN is named 'conv'
        tail = bn_or_conv(path[2:], "conv", "norm")
        return f"slowfast_model.feature_extraction.0.multipathway_blocks.{pw}.{tail}"
    m = re.match(r"fuse_(stem|res(\d))$", top)
    if m:
        block = 0 if m.group(1) == "stem" else int(m.group(2)) - 1
        tail = bn_or_conv(path[2:], "conv_fast_to_slow", "norm")
        return f"slowfast_model.feature_extraction.{block}.multipathway_fusion.{tail}"
    m = re.match(r"(slow|fast)_res(\d)$", top)
    if m:
        pw = 0 if m.group(1) == "slow" else 1
        block = int(m.group(2)) - 1
        j = path[1].split("_")[1]  # block_{j}
        sub = path[2]  # conv_a|conv_b|conv_c|shortcut
        if sub == "shortcut":
            tail = bn_or_conv(path[3:], "branch1_conv", "branch1_norm")
        else:
            tail = bn_or_conv(path[3:], f"branch2.{sub}", f"branch2.norm_{sub[-1]}")
        return (
            f"slowfast_model.feature_extraction.{block}.multipathway_blocks.{pw}"
            f".res_blocks.{j}.{tail}"
        )
    raise KeyError(f"unmapped slowfast flax path: {path}")


def slowfast_state_dict(
    cfg: AssessorConfig, rng: np.random.Generator
) -> Dict[str, np.ndarray]:
    """pytorchvideo-named tensors covering EVERY param of this repo's
    SlowFastR50 at `cfg.motion` scale (shapes derived from a flax init and
    inverse-transposed to torch NCDHW), plus the `num_batches_tracked`
    counters real checkpoints carry (skipped by the converter)."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.motion import SlowFastR50

    model = SlowFastR50(cfg.motion, Precision.fp32())
    t = max(cfg.motion.alpha, 8)
    dummy = jnp.zeros((1, t, cfg.vision.image_size, cfg.vision.image_size, 3))
    shapes = jax.eval_shape(model.init, jax.random.key(0), dummy)
    flat = traverse_util.flatten_dict(shapes["params"])

    sd: Dict[str, np.ndarray] = {}
    for path, leaf in flat.items():
        torch_key = flax_slowfast_path_to_torch(tuple(str(p) for p in path))
        shape = leaf.shape
        leaf_name = str(path[-1])
        if leaf_name == "var":  # BN running_var must be positive (rsqrt)
            val = rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
        elif leaf_name == "scale":  # BN weight near 1 like trained nets
            val = rng.uniform(0.8, 1.2, size=shape).astype(np.float32)
        else:
            val = rng.normal(scale=0.02, size=shape).astype(np.float32)
        if leaf_name == "kernel":  # conv kernels; BN leaves are vectors
            # flax DHWIO -> torch [O, I, D, H, W] (converter transposes back
            # with (2, 3, 4, 1, 0), `convert_weights.py`)
            val = val.transpose(4, 3, 0, 1, 2)
        sd[torch_key] = np.ascontiguousarray(val)
        if torch_key.endswith("running_var"):
            sd[torch_key.replace("running_var", "num_batches_tracked")] = np.zeros(
                (), np.int64
            )
    return sd


# ------------------------------------------------------------------ write --


def reference_config_dict(cfg: AssessorConfig) -> dict:
    """config.json in the reference's composite format
    (`configuration_internvl_chat.py:20-108`: vision_config/llm_config
    sub-dicts + top-level pipeline fields)."""
    import dataclasses

    llm_d = dataclasses.asdict(cfg.llm)
    llm_d["architectures"] = [llm_d.pop("architecture")]
    rs = llm_d.get("rope_scaling")
    if rs is not None:
        llm_d["rope_scaling"] = {"type": rs["type"], "factor": rs["factor"]}
    return {
        "model_type": "internvl_chat",
        "vision_config": dataclasses.asdict(cfg.vision),
        "llm_config": llm_d,
        "motion_config": dataclasses.asdict(cfg.motion),
        "score_head_dims": list(cfg.score_head_dims),
        "downsample_ratio": cfg.downsample_ratio,
        "ps_version": cfg.ps_version,
        "select_layer": cfg.select_layer,
        "template": cfg.template,
        "force_image_size": cfg.force_image_size,
        "max_dynamic_patch": cfg.max_dynamic_patch,
        "min_dynamic_patch": cfg.min_dynamic_patch,
        "dynamic_image_size": cfg.dynamic_image_size,
        "use_thumbnail": cfg.use_thumbnail,
        "pad2square": cfg.pad2square,
    }


def write_sharded_safetensors(
    sd: Dict[str, np.ndarray], out_dir: str, n_shards: int = 2
) -> List[str]:
    """Write `sd` as HF-style sharded safetensors + index.json."""
    import torch
    from safetensors.torch import save_file

    keys = sorted(sd.keys())
    shards: List[List[str]] = [[] for _ in range(n_shards)]
    sizes = [0] * n_shards
    for k in keys:  # greedy size-balanced sharding
        i = sizes.index(min(sizes))
        shards[i].append(k)
        sizes[i] += sd[k].nbytes
    names = [
        f"model-{i + 1:05d}-of-{n_shards:05d}.safetensors" for i in range(n_shards)
    ]
    weight_map = {}
    for name, shard_keys in zip(names, shards):
        tensors = {
            # bf16 like real checkpoints (the safetensors numpy interface
            # can't express bf16 — this exercises the torch read path);
            # integer tensors (num_batches_tracked) stay as-is
            k: (
                torch.from_numpy(sd[k]).to(torch.bfloat16)
                if np.issubdtype(sd[k].dtype, np.floating)
                else torch.from_numpy(sd[k])
            )
            for k in shard_keys
        }
        save_file(tensors, os.path.join(out_dir, name))
        for k in shard_keys:
            weight_map[k] = name
    index = {
        "metadata": {"total_size": int(sum(v.nbytes for v in sd.values()))},
        "weight_map": weight_map,
    }
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2, sort_keys=True)
    return names


def make_synthetic_checkpoint(
    out_dir: str,
    stage: int = 2,
    n_shards: int = 2,
    seed: int = 0,
    with_slowfast: bool = True,
) -> AssessorConfig:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    from aigv_assessor_tpu.data.tokenizer import build_test_tokenizer

    tokenizer = build_test_tokenizer()
    cfg = AssessorConfig.tiny(stage=stage).replace(
        img_context_token_id=int(tokenizer.img_context_token_id)
    )
    sd = reference_state_dict(cfg, rng)
    if with_slowfast:
        sd.update(slowfast_state_dict(cfg, rng))
    write_sharded_safetensors(sd, out_dir, n_shards)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(reference_config_dict(cfg), f, indent=2, sort_keys=True)
    tokenizer._tk.save(os.path.join(out_dir, "tokenizer.json"))
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-slowfast", action="store_true")
    args = ap.parse_args(argv)
    make_synthetic_checkpoint(
        args.out, args.stage, args.shards, args.seed, not args.no_slowfast
    )
    print(f"wrote synthetic reference-format checkpoint to {args.out}")


if __name__ == "__main__":
    main()
