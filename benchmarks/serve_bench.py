"""Online serving throughput: concurrent HTTP clients against cli/serve.

Measures the ONLINE analog of the offline headline (videos scored/sec):
N clients post videos concurrently; the service micro-batches them onto
the one compiled batch shape. Expect the offline device rate minus
HTTP/decode overhead (decode runs on handler threads and overlaps device
compute).

Usage:
  # terminal 1 (TPU):
  python -m aigv_assessor_tpu.cli.serve --model_scale 2b --batch_size 4 --port 8762
  # terminal 2:
  python benchmarks/serve_bench.py --port 8762 --n 48 --concurrency 16
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image


def make_gif(seed: int, frames: int = 10, size: int = 256) -> bytes:
    rng = np.random.default_rng(seed)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8))
        for _ in range(frames)
    ]
    buf = io.BytesIO()
    imgs[0].save(
        buf, format="GIF", save_all=True, append_images=imgs[1:], duration=100
    )
    return buf.getvalue()


def make_mp4(seed: int, frames: int = 16, size: int = 256) -> bytes:
    """Synthetic mp4 via cv2 (the production container: decoded by the
    native GIL-free ffmpeg reader, unlike GIFs which go through PIL)."""
    import os
    import tempfile

    import cv2

    rng = np.random.default_rng(seed)
    path = tempfile.mktemp(suffix=".mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (size, size))
    base = rng.integers(0, 255, (size, size, 3), np.uint8)
    for i in range(frames):
        frame = np.roll(base, i * 7, axis=1)
        w.write(frame)
    w.release()
    with open(path, "rb") as f:
        data = f.read()
    os.unlink(path)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8762)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--format", default="mp4", choices=["mp4", "gif"])
    args = ap.parse_args()

    mk = make_mp4 if args.format == "mp4" else make_gif
    videos = [mk(i) for i in range(args.n)]

    def score(body):
        conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
        ctype = "video/mp4" if args.format == "mp4" else "image/gif"
        conn.request(
            "POST", "/score", body=body, headers={"Content-Type": ctype}
        )
        r = conn.getresponse()
        payload = json.loads(r.read())
        assert r.status == 200, payload
        return payload["scores"]

    def statz():
        conn = http.client.HTTPConnection(args.host, args.port, timeout=60)
        conn.request("GET", "/statz")
        return json.loads(conn.getresponse().read())

    score(videos[0])  # warm the whole path
    pre = statz()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.concurrency) as pool:
        results = list(pool.map(score, videos))
    dt = time.perf_counter() - t0
    assert len(results) == args.n
    post = statz()
    # per-batch attribution over the measured window only
    db = max(post["batches"] - pre["batches"], 1)
    window = {
        "batches": db,
        "mean_batch_fill": round(
            (post["jobs"] - pre["jobs"]) / db, 3
        ),
        "linger_ms_per_batch": round(
            (post["linger_s_per_batch"] * post["batches"]
             - pre["linger_s_per_batch"] * pre["batches"]) / db * 1e3, 2),
        "assemble_ms_per_batch": round(
            (post["assemble_s_per_batch"] * post["batches"]
             - pre["assemble_s_per_batch"] * pre["batches"]) / db * 1e3, 2),
        "flush_ms_per_batch": round(
            (post["flush_s_per_batch"] * post["batches"]
             - pre["flush_s_per_batch"] * pre["batches"]) / db * 1e3, 2),
        "decode_s_mean": post["decode_s_mean"],
    }
    print(
        json.dumps(
            {
                "metric": "online_videos_scored_per_sec",
                "value": round(args.n / dt, 3),
                "unit": "videos/sec",
                "n": args.n,
                "concurrency": args.concurrency,
                "mean_latency_s": round(dt / args.n * args.concurrency, 3),
                "statz_window": window,
            }
        )
    )


if __name__ == "__main__":
    main()
