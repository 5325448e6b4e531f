"""Int8 weight export.

Equivalent of `/root/reference/tools/convert_to_int8.py:4-15` (bitsandbytes
8-bit export): per-output-channel symmetric int8 quantization of every Dense
kernel, stored as {values int8, scales fp32}. Halves checkpoint size and HBM
footprint for serving; `load_int8_params` dequantizes to bf16 at load (an
on-the-fly int8 matmul kernel is a serving optimization on top of this
format).
"""

from __future__ import annotations

import argparse

import numpy as np
from flax import serialization, traverse_util


def quantize_kernel(w: np.ndarray):
    """[in, out] (or stacked [L, in, out], scan-over-layers) -> int8 values
    + per-out-channel scale ([out] or [L, out])."""
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def dequantize_kernel(q: np.ndarray, scale: np.ndarray, dtype=np.float32):
    return (q.astype(np.float32) * scale[..., None, :]).astype(dtype)


def quantize_tree(
    params: dict,
    min_size: int = 4096,
    scope="language_model",
    exclude: tuple = (),
    only_base: bool = False,
) -> dict:
    """Quantize Dense kernels under `scope` (default: the LLM only — the
    W8A16 serving path runs int8 matmuls in the decoder; the ViT stays bf16
    where its batched encode is MXU-compute-bound, not weight-bound).
    scope='' quantizes every eligible kernel; a tuple quantizes several
    towers (the W8A8 MXU path quantizes BOTH towers but excludes the LM
    head, which stays fp32-logits: pass exclude=('output',))."""
    scopes = (scope,) if isinstance(scope, str) else tuple(scope)
    flat = traverse_util.flatten_dict(params)
    out = {}
    n_q = 0
    for key, v in flat.items():
        name = str(key[-1])
        v = np.asarray(v)
        in_scope = not any(scopes) or any(str(k) in scopes for k in key)
        if exclude and any(str(k) in exclude for k in key):
            in_scope = False
        # LoRA adapters stay float (they are the trainable deltas); ndim 3 =
        # scan-over-layers stacked kernels [L, in, out]
        is_base_kernel = name == "kernel" and v.ndim in (2, 3)
        if only_base:
            # structural selection: exactly the LoRADense `base` kernels —
            # the set the model dispatches to W8A8Dense — independent of
            # kernel size (tiny test configs fall under any size floor)
            is_base_kernel = is_base_kernel and len(key) >= 2 and str(key[-2]) == "base"
            size_ok = True
        else:
            size_ok = v.size >= min_size
        if in_scope and is_base_kernel and size_ok:
            q, scale = quantize_kernel(v)
            out[key[:-1] + ("kernel_int8",)] = q
            out[key[:-1] + ("kernel_scale",)] = scale
            n_q += 1
        else:
            out[key] = v
    print(f"quantized {n_q} kernels")
    return traverse_util.unflatten_dict(out)


def quantize_kernel_int4(w: np.ndarray):
    """4-bit per-channel symmetric quantization, two values packed per int8
    byte along the IN dim (the reference's bitsandbytes `load_in_4bit`
    equivalent at the checkpoint level; dequantized to bf16 at load — bnb's
    nf4 also dequantizes for the matmul)."""
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    if q.shape[-2] % 2:
        pad = [(0, 0)] * q.ndim
        pad[-2] = (0, 1)
        q = np.pad(q, pad)
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.int8)
    return packed, np.squeeze(scale, axis=-2)


def dequantize_kernel_int4(
    packed: np.ndarray, scale: np.ndarray, in_dim: int, dtype=np.float32
):
    def unpack_nibble(x):
        # sign-extend the low nibble
        return ((x.astype(np.int8) << 4).astype(np.int8) >> 4).astype(np.int8)

    lo = unpack_nibble(packed)
    hi = packed.astype(np.int8) >> 4  # arithmetic shift sign-extends
    q = np.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    q = q.reshape(packed.shape[:-2] + (2 * packed.shape[-2], packed.shape[-1]))
    q = q[..., :in_dim, :]
    return (q.astype(np.float32) * scale[..., None, :]).astype(dtype)


def quantize_tree_int4(
    params: dict, min_size: int = 4096, scope: str = "language_model"
) -> dict:
    flat = traverse_util.flatten_dict(params)
    out = {}
    n_q = 0
    for key, v in flat.items():
        name = str(key[-1])
        v = np.asarray(v)
        in_scope = not scope or any(str(k) == scope for k in key)
        if in_scope and name == "kernel" and v.ndim in (2, 3) and v.size >= min_size:
            packed, scale = quantize_kernel_int4(v)
            out[key[:-1] + ("kernel_int4",)] = packed
            out[key[:-1] + ("kernel_scale4",)] = scale
            out[key[:-1] + ("kernel_in_dim",)] = np.asarray(v.shape[-2], np.int32)
            n_q += 1
        else:
            out[key] = v
    print(f"quantized {n_q} kernels to int4")
    return traverse_util.unflatten_dict(out)


def strip_int4_meta(params: dict) -> dict:
    """Drop the `kernel_in_dim` bookkeeping scalars (needed only to
    dequantize odd in_dims) so the tree matches Int4Dense's parameters —
    required before serving an int4 tree (scan can't slice scalars)."""
    flat = traverse_util.flatten_dict(params)
    out = {k: v for k, v in flat.items() if str(k[-1]) != "kernel_in_dim"}
    return traverse_util.unflatten_dict(out)


def dequantize_tree(params: dict, dtype=np.float32) -> dict:
    flat = traverse_util.flatten_dict(params)
    out = {}
    for key, v in flat.items():
        name = str(key[-1])
        if name == "kernel_int8":
            scale = flat[key[:-1] + ("kernel_scale",)]
            out[key[:-1] + ("kernel",)] = dequantize_kernel(
                np.asarray(v), np.asarray(scale), dtype
            )
        elif name == "kernel_int4":
            scale = flat[key[:-1] + ("kernel_scale4",)]
            in_dim = int(flat[key[:-1] + ("kernel_in_dim",)])
            out[key[:-1] + ("kernel",)] = dequantize_kernel_int4(
                np.asarray(v), np.asarray(scale), in_dim, dtype
            )
        elif name in ("kernel_scale", "kernel_scale4", "kernel_in_dim"):
            continue
        else:
            out[key] = v
    return traverse_util.unflatten_dict(out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--scope", default="language_model",
                    help="subtree to quantize ('' = everything eligible)")
    ap.add_argument("--dequantize", action="store_true",
                    help="reverse: int8/int4 file -> fp32 params")
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    if args.dequantize:
        out = dequantize_tree(params)
    elif args.bits == 4:
        out = quantize_tree_int4(params, scope=args.scope)
    else:
        out = quantize_tree(params, scope=args.scope)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
