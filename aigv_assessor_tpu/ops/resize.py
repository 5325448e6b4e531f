"""Torch-exact separable bicubic resize as two small matmuls.

The reference interpolates the ViT position embedding with
`F.interpolate(..., mode='bicubic', align_corners=False)`
(`/root/reference/internvl/model/internvl_chat/modeling_intern_vit.py:87-93`
and `resize_pos_embeddings` at 309-319). torch's bicubic uses the
Keys cubic-convolution kernel with A = -0.75; `jax.image.resize`'s
"bicubic" uses A = -0.5, so the two drift by up to ~1e-2 on smooth
data — enough to break checkpoint parity at non-448 eval sizes.

Because the source/target grids are static under jit, the resize is a
pair of constant interpolation matrices applied as matmuls
(`out = R @ img @ C^T`): exact torch semantics, and MXU-shaped instead
of gather-based.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """ATen `get_cubic_upsample_coefficients`: 4 tap weights for fractional
    offset t in [0, 1). Returns [..., 4]."""
    # taps at distances (t+1, t, 1-t, 2-t) from the sample point
    def conv1(x):  # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1

    def conv2(x):  # 1 < |x| < 2
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a

    w0 = conv2(t + 1.0)
    w1 = conv1(t)
    w2 = conv1(1.0 - t)
    w3 = conv2(2.0 - t)
    return np.stack([w0, w1, w2, w3], axis=-1)


def bicubic_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """[dst, src] interpolation matrix matching
    `F.interpolate(mode='bicubic', align_corners=False)` along one axis
    (border taps clamped, like ATen's `upsample_get_value_bounded`)."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    scale = src / dst
    d = np.arange(dst, dtype=np.float64)
    real = scale * (d + 0.5) - 0.5  # area_pixel_compute_source_index
    i0 = np.floor(real).astype(np.int64)
    t = real - i0
    w = _cubic_weights(t, a)  # [dst, 4]
    mat = np.zeros((dst, src), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(i0 - 1 + tap, 0, src - 1)
        np.add.at(mat, (np.arange(dst), idx), w[:, tap])
    return mat.astype(np.float32)


def bicubic_resize_grid(
    grid: jnp.ndarray, h: int, w: int, a: float = -0.75
) -> jnp.ndarray:
    """[B, Hs, Ws, C] -> [B, h, w, C], torch-bicubic, fp32 accumulation."""
    _, hs, ws, _ = grid.shape
    r = jnp.asarray(bicubic_matrix(hs, h, a))
    c = jnp.asarray(bicubic_matrix(ws, w, a))
    out = jnp.einsum(
        "hH,bHWc,wW->bhwc",
        r,
        grid.astype(jnp.float32),
        c,
        precision="highest",
    )
    return out.astype(grid.dtype)
