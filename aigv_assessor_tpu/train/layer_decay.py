"""Layer-wise learning-rate decay.

Equivalent of the reference's custom-optimizer monkey patch
(`/root/reference/internvl/train/trainer_monkey_patch.py:61-159`): per-layer
LR multipliers `rate^(n_layers - layer_id)` for the ViT (and LLM) parameter
groups, controlled by the same env vars (VIT_LAYER_DECAY_RATE /
QLLAMA_LAYER_DECAY_RATE / QLLAMA_LR_SCALE, lines 80-82) and enabled via
`--use_custom_trainer` in the reference. Implemented as an optax transform
that scales updates by the per-leaf multiplier — no trainer patching.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import optax


def _layer_id_from_path(path: str, num_vit_layers: int, num_llm_layers: int):
    """(group, layer_id, n_layers) for a param path; mirrors
    `get_num_layer_for_vit` / the llm split in `trainer_monkey_patch.py`."""
    if "vision_model" in path:
        if "embeddings" in path or "patch_embedding" in path:
            return "vit", 0, num_vit_layers + 2
        m = re.search(r"layers_(\d+)", path)
        if m:
            return "vit", int(m.group(1)) + 1, num_vit_layers + 2
        return "vit", num_vit_layers + 1, num_vit_layers + 2
    if "language_model" in path:
        if "tok_embeddings" in path or "embed_tokens" in path:
            return "llm", 0, num_llm_layers + 2
        m = re.search(r"layers_(\d+)", path)
        if m:
            return "llm", int(m.group(1)) + 1, num_llm_layers + 2
        return "llm", num_llm_layers + 1, num_llm_layers + 2
    return None, 0, 1


def layer_decay_multipliers(
    params: Any,
    num_vit_layers: int,
    num_llm_layers: int,
    vit_decay_rate: Optional[float] = None,
    llm_decay_rate: Optional[float] = None,
    llm_lr_scale: Optional[float] = None,
) -> Any:
    """Pytree of per-leaf LR multipliers. Rates default from the reference's
    env vars; 1.0 disables."""
    vit_decay_rate = (
        vit_decay_rate
        if vit_decay_rate is not None
        else float(os.environ.get("VIT_LAYER_DECAY_RATE", 1.0))
    )
    llm_decay_rate = (
        llm_decay_rate
        if llm_decay_rate is not None
        else float(os.environ.get("QLLAMA_LAYER_DECAY_RATE", 1.0))
    )
    llm_lr_scale = (
        llm_lr_scale
        if llm_lr_scale is not None
        else float(os.environ.get("QLLAMA_LR_SCALE", 1.0))
    )

    def one(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        # scan-over-layers: params under `.../layers/...` are stacked with a
        # leading [num_layers] dim -> a per-layer multiplier VECTOR broadcast
        # over that dim reproduces the unrolled per-group LRs exactly
        if re.search(r"/layers/", p) or p.startswith("layers/"):
            if "vision_model" in p:
                n = num_vit_layers + 2
                vec = vit_decay_rate ** (
                    n - 1 - (jax.numpy.arange(num_vit_layers) + 1)
                )
            elif "language_model" in p:
                n = num_llm_layers + 2
                vec = llm_lr_scale * llm_decay_rate ** (
                    n - 1 - (jax.numpy.arange(num_llm_layers) + 1)
                )
            else:
                return 1.0
            return vec.reshape((-1,) + (1,) * (leaf.ndim - 1)).astype(
                leaf.dtype if jax.numpy.issubdtype(leaf.dtype, jax.numpy.floating)
                else jax.numpy.float32
            )
        group, layer_id, n = _layer_id_from_path(p, num_vit_layers, num_llm_layers)
        if group == "vit":
            return vit_decay_rate ** (n - 1 - layer_id)
        if group == "llm":
            return llm_lr_scale * llm_decay_rate ** (n - 1 - layer_id)
        return 1.0

    return jax.tree_util.tree_map_with_path(one, params)


def scale_by_layer_decay(multipliers: Any) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, m: u * m, updates, multipliers
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
