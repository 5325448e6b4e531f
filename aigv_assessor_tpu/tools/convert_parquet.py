"""OCR-parquet -> JSONL converter.

Equivalent of `/root/reference/tools/convert_parquet.py:1-83`: read parquet
shards of (image, question, answer) rows, dump images to a folder and emit a
conversation-JSONL annotation file. Uses pandas/pyarrow when available.
"""

from __future__ import annotations

import argparse
import io
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+", help="parquet files")
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--image_key", default="image")
    ap.add_argument("--question_key", default="question")
    ap.add_argument("--answer_key", default="answer")
    args = ap.parse_args(argv)

    import pandas as pd
    from PIL import Image

    os.makedirs(args.image_dir, exist_ok=True)
    n = 0
    with open(args.output, "w") as fout:
        for path in args.inputs:
            df = pd.read_parquet(path)
            for _, row in df.iterrows():
                img_val = row[args.image_key]
                if isinstance(img_val, dict) and "bytes" in img_val:
                    img_val = img_val["bytes"]
                img = Image.open(io.BytesIO(img_val)).convert("RGB")
                img_name = f"{n:08d}.jpg"
                img.save(os.path.join(args.image_dir, img_name))
                item = {
                    "id": n,
                    "image": img_name,
                    "conversations": [
                        {"from": "human", "value": f"<image>\n{row[args.question_key]}"},
                        {"from": "gpt", "value": str(row[args.answer_key])},
                    ],
                }
                fout.write(json.dumps(item, ensure_ascii=False) + "\n")
                n += 1
    print(f"wrote {n} samples to {args.output}")


if __name__ == "__main__":
    main()
