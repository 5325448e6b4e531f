"""Merge LoRA adapters into base weights.

Equivalent of `/root/reference/tools/merge_lora.py:18-25`
(`merge_and_unload` on both the ViT and LLM adapters): for every LoRADense,
W <- W + (alpha/r) * A @ B, then the adapter leaves are dropped, producing a
LoRA-free parameter file loadable with use_*_lora = 0.

Usage:
  python -m aigv_assessor_tpu.tools.merge_lora \
      --params params.msgpack --config config.json --out merged.msgpack
"""

from __future__ import annotations

import argparse

import numpy as np
from flax import serialization, traverse_util


def merge_lora_tree(params: dict, backbone_r: int, llm_r: int) -> dict:
    flat = traverse_util.flatten_dict(params)
    out = {}
    for key, v in flat.items():
        ks = tuple(map(str, key))
        if ks[-1] in ("lora_a", "lora_b"):
            continue
        out[key] = v
    for key, v in flat.items():
        ks = tuple(map(str, key))
        if ks[-1] != "lora_a":
            continue
        b_key = key[:-1] + ("lora_b",)
        base_key = key[:-1] + ("base", "kernel")
        if b_key not in flat or base_key not in flat:
            raise KeyError(f"incomplete LoRA triple at {key}")
        r = flat[key].shape[1]
        # alpha = 2r in both wrap methods
        # (`internvl_chat_stage2_lora/modeling_internvl_chat.py:270-274`)
        scaling = (2 * r) / r
        delta = np.asarray(flat[key]) @ np.asarray(flat[b_key]) * scaling
        out[base_key] = np.asarray(flat[base_key]) + delta.astype(
            flat[base_key].dtype
        )
    return traverse_util.unflatten_dict(out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    merged = merge_lora_tree(params, 0, 0)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(merged))
    print(f"wrote merged params to {args.out}")


if __name__ == "__main__":
    main()
