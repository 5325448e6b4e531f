"""Extract the vision tower from a composite checkpoint.

Equivalent of `/root/reference/tools/extract_vit.py:12-15` (save the
`vision_model` submodule as a standalone checkpoint).

Usage:
  python -m aigv_assessor_tpu.tools.extract_vit --params params.msgpack --out vit.msgpack
"""

from __future__ import annotations

import argparse

from flax import serialization


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    tree = params.get("params", params)
    vit = {"params": {"vision_model": tree["vision_model"]}}
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(vit))
    print(f"wrote vision tower to {args.out}")


if __name__ == "__main__":
    main()
