"""Swap the language model inside a composite checkpoint.

Equivalent of `/root/reference/tools/replace_llm.py:16-27` (load a composite
checkpoint, replace its `language_model` weights with another LLM checkpoint,
save).

Usage:
  python -m aigv_assessor_tpu.tools.replace_llm \
      --params params.msgpack --llm_params llm.msgpack --out swapped.msgpack
"""

from __future__ import annotations

import argparse

from flax import serialization


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--llm_params", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    with open(args.llm_params, "rb") as f:
        llm = serialization.msgpack_restore(f.read())
    llm_tree = llm.get("params", llm)
    if "language_model" in llm_tree:
        llm_tree = llm_tree["language_model"]
    params.get("params", params)["language_model"] = llm_tree
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(f"replaced language_model; wrote {args.out}")


if __name__ == "__main__":
    main()
