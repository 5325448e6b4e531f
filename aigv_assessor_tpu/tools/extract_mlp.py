"""Extract the mlp1 projector from a composite checkpoint.

Equivalent of `/root/reference/tools/extract_mlp.py:13-18` (save `mlp1` as
'mlp_projector.pth'; here as msgpack). The artifact can be hot-loaded by the
stage-1 entry via --mlp_path (reference `stage1_train.py:854-858`).
"""

from __future__ import annotations

import argparse

from flax import serialization


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True)
    ap.add_argument("--out", default="mlp_projector.msgpack")
    args = ap.parse_args(argv)
    with open(args.params, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    tree = params.get("params", params)
    out = {"mlp1": tree["mlp1"], "motion_mlp": tree.get("motion_mlp")}
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote projector to {args.out}")


if __name__ == "__main__":
    main()
