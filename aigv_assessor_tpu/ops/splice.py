"""Vision/motion token splice.

JIT-compatible replacement for the reference's boolean-mask assignment
(`/root/reference/internvl/model/internvl_chat/modeling_internvl_chat.py:292-328`):
the reference computes `selected = (input_ids == img_context_token_id)`, marks
the LAST such position per sample via a cumsum trick, then in-place assigns
ViT embeddings to all-but-last positions and the motion embedding to the last.
Boolean advanced indexing is not traceable, so we express the same thing as a
gather + `jnp.where`: every position knows its 0-based rank among the context
tokens of its sample (cumsum-1), gathers the corresponding ViT row, and a mask
select keeps text embeddings elsewhere. Fixed shapes, no scatter — XLA fuses
this into a few vectorized selects.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def splice_image_embeds(
    input_embeds: jnp.ndarray,  # [B, N, C]
    input_ids: jnp.ndarray,  # [B, N] int32
    vit_embeds: jnp.ndarray,  # [B, n_vit, C] per-sample visual tokens, in order
    img_context_token_id: int,
    motion_embeds: Optional[jnp.ndarray] = None,  # [B, C]
) -> jnp.ndarray:
    """Place visual (and optionally motion) embeddings at <IMG_CONTEXT> slots.

    With `motion_embeds`, the last context slot per sample receives the motion
    embedding and the preceding slots receive `vit_embeds` rows in order
    (reference `selected1`/`selected2`, `modeling_internvl_chat.py:292-319`).
    Without it, all context slots receive `vit_embeds` rows (reference
    `generate()` path, lines 669-672).
    """
    if vit_embeds.ndim == 2:
        b = input_embeds.shape[0]
        vit_embeds = vit_embeds.reshape(b, -1, input_embeds.shape[-1])
    n_vit = vit_embeds.shape[1]

    mask = input_ids == img_context_token_id  # [B, N]
    cums = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # 1-based rank at ctx slots
    rank = cums - 1  # 0-based rank of each ctx slot within its sample

    gathered = jnp.take_along_axis(
        vit_embeds,
        jnp.clip(rank, 0, n_vit - 1)[:, :, None],
        axis=1,
    )  # [B, N, C]
    gathered = gathered.astype(input_embeds.dtype)

    if motion_embeds is None:
        return jnp.where(mask[:, :, None], gathered, input_embeds)

    total = cums[:, -1:]  # number of ctx tokens per sample
    is_last = mask & (cums == total)  # [B, N]
    vit_mask = mask & ~is_last

    out = jnp.where(vit_mask[:, :, None], gathered, input_embeds)
    motion = motion_embeds.astype(input_embeds.dtype)[:, None, :]  # [B, 1, C]
    return jnp.where(is_last[:, :, None], motion, out)
