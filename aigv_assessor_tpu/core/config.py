"""Model / pipeline configuration.

One parameterized configuration tree replaces the six near-identical model
packages of the reference (`/root/reference/internvl/model/internvl_chat*`,
see SURVEY.md §1 "The six model-package variants"): stage-1 vs stage-2
behavior is selected by `AssessorConfig.stage` and LoRA by
`AssessorConfig.use_backbone_lora` / `use_llm_lora`, mirroring
`configuration_internvl_chat.py:20-108` of the reference without the
hard-coded-path bug it carries at lines 42-46.

All configs are plain frozen dataclasses so they are hashable and can be
closed over by `jax.jit` as static arguments.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class VisionConfig:
    """InternViT-300M-class encoder config.

    Field semantics follow the reference vision config
    (`/root/reference/internvl/model/internvl_chat/config.json:117-200`).
    """

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "gelu"
    # tanh-approximate GELU in the encoder MLP: the exact erf lowers to a
    # long VPU polynomial on TPU and costs ~2.3 ms/layer at bs=64/448px
    # (measured, BENCH_NOTES.md); tanh-GELU matches to ~1e-3 relative and is
    # fully fused. Set False for bit-closer parity with the reference's
    # torch nn.GELU (erf).
    approximate_gelu: bool = True
    norm_type: str = "layer_norm"  # 'layer_norm' | 'rms_norm'
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    qk_normalization: bool = False
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    attention_dropout: float = 0.0
    initializer_factor: float = 1.0
    initializer_range: float = 0.02
    use_flash_attn: bool = True
    # scan-over-layers (see LLMConfig.scan_layers); the python-loop path is
    # kept for select_layer != -1 (partial-depth feature extraction)
    scan_layers: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VisionConfig":
        return cls(**_filter_kwargs(cls, d))

    @classmethod
    def tiny(cls) -> "VisionConfig":
        """Small config for CPU tests."""
        return cls(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
            drop_path_rate=0.0,
        )


@dataclass(frozen=True)
class RopeScaling:
    type: str = "dynamic"  # 'dynamic' | 'linear' | None
    factor: float = 2.0


@dataclass(frozen=True)
class LLMConfig:
    """InternLM2.5-7B-chat-class decoder config.

    Mirrors `/root/reference/internvl/model/internlm2/configuration_internlm2.py:77-121`
    and the instantiated values in
    `/root/reference/internvl/model/internvl_chat/config.json:15-104`.
    """

    architecture: str = "InternLM2ForCausalLM"
    vocab_size: int = 92553
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    hidden_act: str = "silu"
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    rope_scaling: Optional[RopeScaling] = RopeScaling()
    bias: bool = False
    # per-projection overrides (None -> follow `bias`): Qwen2 uses biased
    # q/k/v with bias-free o_proj; Llama exposes `attention_bias`
    qkv_bias: Optional[bool] = None
    o_bias: Optional[bool] = None
    tie_word_embeddings: bool = False
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 2
    initializer_range: float = 0.02
    # scan-over-layers: stack the decoder layers' params with a leading
    # [num_layers] dim and run them under `nn.scan`, so XLA traces/compiles
    # ONE layer instead of 32 (a 2B forward otherwise takes minutes to
    # compile through the tunnel). Param trees use `layers` (stacked) instead
    # of `layers_{i}`; `utils/stacking.py` converts between the two.
    scan_layers: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LLMConfig":
        d = dict(d)
        if "architectures" in d and d.get("architectures"):
            d["architecture"] = d["architectures"][0]
        arch = d.get("architecture", "")
        # HF Llama/Qwen2 configs map onto the same GQA+SwiGLU decoder
        # (reference dispatches all four families,
        # `configuration_internvl_chat.py:56-63`)
        if arch == "LlamaForCausalLM":
            d.setdefault("qkv_bias", bool(d.pop("attention_bias", False)))
            d.setdefault("o_bias", d["qkv_bias"])
        elif arch == "Qwen2ForCausalLM":
            d.setdefault("qkv_bias", True)
            d.setdefault("o_bias", False)
        rs = d.get("rope_scaling")
        if isinstance(rs, dict):
            d["rope_scaling"] = RopeScaling(
                type=rs.get("type", "dynamic"), factor=float(rs.get("factor", 1.0))
            )
        elif rs is None and arch in ("LlamaForCausalLM", "Qwen2ForCausalLM"):
            d["rope_scaling"] = None
        return cls(**_filter_kwargs(cls, d))

    @property
    def effective_qkv_bias(self) -> bool:
        return self.bias if self.qkv_bias is None else self.qkv_bias

    @property
    def effective_o_bias(self) -> bool:
        return self.bias if self.o_bias is None else self.o_bias

    @classmethod
    def tiny(cls) -> "LLMConfig":
        return cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=4096,
        )


@dataclass(frozen=True)
class MotionConfig:
    """SlowFast-R50 motion branch config.

    The reference instantiates pytorchvideo `slowfast_r50(pretrained=True)` and
    keeps stages 0-4 plus the slow/fast pools
    (`/root/reference/internvl/model/internvl_chat/modeling_internvl_chat.py:116-174`).
    `alpha` is the slow/fast frame-rate ratio (slow path sees T//alpha frames,
    `pack_pathway_output`, same file lines 78-114); output feature is
    2048 (slow) + 256 (fast) = 2304 channels.
    """

    alpha: int = 4
    slow_width: int = 64
    fast_width: int = 8
    stage_depths: Tuple[int, int, int, int] = (3, 4, 6, 3)  # R50
    fusion_kernel: int = 7
    fusion_conv_ratio: int = 2
    feature_dim: int = 2304  # 2048 slow + 256 fast after stage 4

    @classmethod
    def tiny(cls) -> "MotionConfig":
        return cls(
            slow_width=8,
            fast_width=1,
            stage_depths=(1, 1, 1, 1),
            # final channels = width * 32 per pathway (R50 expansion), so
            # 8*32 + 1*32 = 288
            feature_dim=288,
        )


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA adapter config; defaults follow the reference wrap methods
    (`/root/reference/internvl/model/internvl_chat_stage2_lora/modeling_internvl_chat.py:276-306`):
    alpha = 2*r, dropout 0.05."""

    r: int = 8
    alpha: int = 16
    dropout: float = 0.05

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


@dataclass(frozen=True)
class AssessorConfig:
    """Composite model config (vision + LLM + motion + projection heads).

    Mirrors `/root/reference/internvl/model/internvl_chat/configuration_internvl_chat.py`
    plus the structural constants from `modeling_internvl_chat.py:176-249`.
    """

    vision: VisionConfig = field(default_factory=VisionConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    motion: MotionConfig = field(default_factory=MotionConfig)

    downsample_ratio: float = 0.5
    ps_version: str = "v2"
    select_layer: int = -1
    template: str = "internlm2-chat"
    force_image_size: Optional[int] = 448
    max_dynamic_patch: int = 6
    min_dynamic_patch: int = 1
    dynamic_image_size: bool = True
    use_thumbnail: bool = True
    pad2square: bool = False

    # stage selection: 1 = text CE loss only; 2 = + mlpscore head, L1 loss
    stage: int = 1
    # LoRA rank (0 = off), following `use_backbone_lora`/`use_llm_lora` ints in
    # the reference config.
    use_backbone_lora: int = 0
    use_llm_lora: int = 0
    lora_dropout: float = 0.05

    # score head: 4096 -> 1024 -> 256 -> 64 -> 16 -> 1, ReLU after every layer
    # including the last (non-negative scores), reference MLP
    # `internvl_chat_stage2_lora/modeling_internvl_chat.py:43-95`.
    score_head_dims: Tuple[int, ...] = (1024, 256, 64, 16, 1)
    # hidden-state read-out position for the score head: hidden[-1][:, -4, :]
    # (`internvl_chat_stage2_lora/modeling_internvl_chat.py:422-426`).
    score_readout_pos: int = -4

    img_context_token_id: int = -1  # set from tokenizer at runtime

    @property
    def num_image_token(self) -> int:
        """Tokens per frame after pixel shuffle: (448/14)^2 * 0.5^2 = 256.

        Reference: `modeling_internvl_chat.py:192`.
        """
        image_size = self.force_image_size or self.vision.image_size
        return int(
            (image_size // self.vision.patch_size) ** 2 * (self.downsample_ratio**2)
        )

    @property
    def vit_hidden_size(self) -> int:
        return self.vision.hidden_size

    @property
    def llm_hidden_size(self) -> int:
        return self.llm.hidden_size

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "AssessorConfig":
        d = dict(d)
        if "vision_config" in d:
            d["vision"] = VisionConfig.from_dict(d.pop("vision_config"))
        if "motion_config" in d:
            # extension field: reference checkpoints carry no SlowFast config
            # (it comes from torch hub at R50 scale, the MotionConfig default);
            # non-default scales (tests, small deployments) serialize it here
            md = d.pop("motion_config")
            md = {
                k: tuple(v) if isinstance(v, list) else v for k, v in md.items()
            }
            d["motion"] = MotionConfig(**_filter_kwargs(MotionConfig, md))
        if isinstance(d.get("score_head_dims"), list):
            d["score_head_dims"] = tuple(d["score_head_dims"])
        if "llm_config" in d:
            llm_d = d.pop("llm_config")
            archs = llm_d.get("architectures") or [llm_d.get("architecture", "")]
            arch = archs[0] if archs else ""
            # 4-way dispatch like the reference composite config
            # (`configuration_internvl_chat.py:56-63`): InternLM2/Llama/Qwen2
            # share the GQA+SwiGLU decoder (LLMConfig), Phi-3 its own
            if arch == "Phi3ForCausalLM":
                from aigv_assessor_tpu.models.phi3 import Phi3Config

                d["llm"] = Phi3Config.from_dict(llm_d)
            elif arch in (
                "",
                "InternLM2ForCausalLM",
                "LlamaForCausalLM",
                "Qwen2ForCausalLM",
            ):
                d["llm"] = LLMConfig.from_dict(llm_d)
            else:
                raise ValueError(f"Unsupported architecture: {arch}")
        return cls(**_filter_kwargs(cls, d))

    @classmethod
    def from_json(cls, path: str) -> "AssessorConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    @classmethod
    def tiny(cls, stage: int = 1, **kw) -> "AssessorConfig":
        kw.setdefault("force_image_size", None)  # use vision.image_size (56)
        return cls(
            vision=VisionConfig.tiny(),
            llm=LLMConfig.tiny(),
            motion=MotionConfig.tiny(),
            stage=stage,
            score_head_dims=(32, 16, 1),
            **kw,
        )

    def replace(self, **kw) -> "AssessorConfig":
        return dataclasses.replace(self, **kw)
