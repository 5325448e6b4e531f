"""Offline position-embedding resize.

Equivalent of `/root/reference/tools/resize_pos_embed.py:14-21` and the
in-model `resize_pos_embeddings` (`modeling_intern_vit.py:309-319`): bicubic
interpolation of the grid part of the ViT position embedding to a new image
size; the cls position is kept.

Usage:
  python -m aigv_assessor_tpu.tools.resize_pos_embed \
      --params params.msgpack --old_size 448 --new_size 336 --patch 14 --out resized.msgpack
"""

from __future__ import annotations

import argparse

import numpy as np
from flax import serialization


def resize_pos_embed(
    pos_embed: np.ndarray, old_size: int, new_size: int, patch_size: int
) -> np.ndarray:
    """pos_embed [1, 1 + (old/p)^2, C] -> [1, 1 + (new/p)^2, C].

    Torch-exact bicubic (A=-0.75, align_corners=False — `ops/resize.py`),
    matching the reference's `F.interpolate(..., mode='bicubic')` so
    offline-resized checkpoints agree with torch-resized ones."""
    from aigv_assessor_tpu.ops.resize import bicubic_matrix

    old_side = old_size // patch_size
    new_side = new_size // patch_size
    cls, grid = pos_embed[:, :1], pos_embed[:, 1:]
    c = grid.shape[-1]
    grid = grid.reshape(old_side, old_side, c).astype(np.float64)
    m = bicubic_matrix(old_side, new_side).astype(np.float64)
    grid = np.einsum("hH,HWc,wW->hwc", m, grid, m)
    grid = grid.astype(pos_embed.dtype)
    return np.concatenate([cls, grid.reshape(1, new_side * new_side, c)], axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--old_size", type=int, required=True)
    ap.add_argument("--new_size", type=int, required=True)
    ap.add_argument("--patch", type=int, default=14)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    tree = params.get("params", params)
    emb = tree["vision_model"]["embeddings"]
    emb["position_embedding"] = resize_pos_embed(
        np.asarray(emb["position_embedding"]),
        args.old_size,
        args.new_size,
        args.patch,
    )
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(
        f"resized pos embed {args.old_size}->{args.new_size}; wrote {args.out}"
    )


if __name__ == "__main__":
    main()
