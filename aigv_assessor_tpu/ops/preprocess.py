"""Device-side frame preprocessing (fused resize + normalize).

The reference does bicubic resize + normalization per frame on the host with
PIL/torchvision (`/root/reference/internvl/train/dataset.py:250-284`), which
on a weak host CPU starves the accelerator. This is the fused on-device
stage from BASELINE.json's north star ("frame sampling, decode, resize and
normalization become a fused JAX/XLA preprocessing stage"): uint8 frames at
native resolution go to the device once; bicubic resize, scaling to [0,1]
and mean/std normalization happen in one jitted program whose output feeds
the ViT directly (XLA fuses the elementwise chain into the resize).

Host/PIL parity note: `jax.image.resize(method='bicubic')` uses the standard
Keys kernel like PIL's BICUBIC; values differ at the 1e-2 level on natural
images (anti-aliasing treatment) — fine for inference, and the host path
remains the default for training parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aigv_assessor_tpu.data.constants import NORMALIZE_STATS  # noqa: F401


@functools.partial(jax.jit, static_argnames=("size", "normalize_type", "dtype"))
def resize_normalize(
    frames: jnp.ndarray,  # [..., H, W, 3] uint8
    size: int = 448,
    normalize_type: str = "imagenet",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """uint8 frames -> normalized [..., size, size, 3] in `dtype`."""
    mean, std = NORMALIZE_STATS[normalize_type]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = frames.astype(jnp.float32) / 255.0
    lead = x.shape[:-3]
    target = lead + (size, size, 3)
    x = jax.image.resize(x, target, method="bicubic")
    x = (x - mean) / std
    return x.astype(dtype)
