"""Torch-differential test for the bicubic pos-embed resize (`ops/resize.py`).

The reference interpolates position embeddings with
`F.interpolate(mode='bicubic', align_corners=False)`
(`modeling_intern_vit.py:87-93`); torch is in this image, so the parity
oracle is torch itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aigv_assessor_tpu.ops.resize import bicubic_matrix, bicubic_resize_grid


def _torch_bicubic(x_nhwc: np.ndarray, h: int, w: int) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).double()
    out = F.interpolate(t, size=(h, w), mode="bicubic", align_corners=False)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize(
    "src,dst",
    [(8, 5), (8, 12), (32, 16), (7, 11), (16, 16)],
)
def test_matrix_matches_torch_1d(src, dst):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, src, src, 3)).astype(np.float64)
    want = _torch_bicubic(x.astype(np.float64), dst, dst)
    m = bicubic_matrix(src, dst).astype(np.float64)
    got = np.einsum("hH,bHWc,wW->bhwc", m, x, m)
    # torch computes source indices in fp32 internally even for double
    # tensors, so agreement bottoms out around 1e-8 per weight
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_resize_grid_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    want = _torch_bicubic(x, 10, 10).astype(np.float32)
    got = np.asarray(bicubic_resize_grid(jnp.asarray(x), 10, 10))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_resize_pos_embed_tool_matches_torch():
    from aigv_assessor_tpu.tools.resize_pos_embed import resize_pos_embed

    rng = np.random.default_rng(2)
    c, old_side, patch = 6, 8, 14
    pos = rng.normal(size=(1, 1 + old_side * old_side, c)).astype(np.float32)
    out = resize_pos_embed(pos, old_side * patch, 5 * patch, patch)
    assert out.shape == (1, 1 + 25, c)
    np.testing.assert_allclose(out[:, :1], pos[:, :1])  # cls kept
    grid = pos[:, 1:].reshape(1, old_side, old_side, c)
    want = _torch_bicubic(grid.astype(np.float64), 5, 5).reshape(1, 25, c)
    np.testing.assert_allclose(out[:, 1:], want, rtol=1e-5, atol=1e-6)
