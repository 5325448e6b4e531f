"""Pixel shuffle (spatial-to-channel downsampling of ViT tokens).

Port of `InternVLChatModel.pixel_shuffle`
(`/root/reference/internvl/model/internvl_chat/modeling_internvl_chat.py:374-388`):
with scale_factor 0.5 it folds each 2x2 patch-token block into channels,
turning 1024 tokens x C into 256 tokens x 4C. Pure reshape/transpose — XLA
compiles it to a copy fused into the following projection matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(
    x: jnp.ndarray, scale_factor: float = 0.5, ps_version: str = "v2"
) -> jnp.ndarray:
    """x: [N, W, H, C] -> [N, H*s, W*s, C/s^2] (v2 swaps H/W back).

    Follows the reference's exact view/permute sequence so converted
    checkpoints see channels in the same order.
    """
    n, w, h, c = x.shape
    # N, W, H, C --> N, W, H*s, C/s
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    # N, W, H*s, C/s --> N, H*s, W, C/s
    x = jnp.transpose(x, (0, 2, 1, 3))
    # N, H*s, W, C/s --> N, H*s, W*s, C/s^2
    x = x.reshape(
        n, int(h * scale_factor), int(w * scale_factor), int(c / (scale_factor**2))
    )
    if ps_version != "v1":
        x = jnp.transpose(x, (0, 2, 1, 3))
    return x
