"""Batch video-scoring CLI (production serving path).

The reference has no dedicated serving entry — scoring runs through the
bs=1 eval loop (`stage2_eval.py:893-962`), and its "4 perspectives"
(`README.md:55`) are four SEPARATE full runs re-encoding the same frames
(`shell/train/stage2_train.sh:13`). This is the TPU-native batched
equivalent (BASELINE.md config #3):

- videos stream through the threaded decode pipeline (native ffmpeg
  decoder) with a two-chunk prefetch window;
- host decode overlaps device compute: the score readback for chunk N is
  deferred until chunk N+1 has been dispatched (double buffering);
- with multiple `--question` flags, all perspectives are scored in ONE
  jitted call off a single shared ViT/motion encode
  (`AIGVAssessor.score_perspectives`);
- the tail chunk is padded to the compiled batch shape (no tail recompile).

Usage:
  python -m aigv_assessor_tpu.cli.score \
      --model_name_or_path ckpt/ --videos dir_or_jsonl \
      --question "How would you rate the static quality of this video?" \
      --question "How would you rate the temporal smoothness of this video?" \
      --batch_size 16 --out scores.csv
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
import sys
import time
from typing import List

import jax
import numpy as np

from aigv_assessor_tpu.cli.args import _bool
from aigv_assessor_tpu.data.preprocess import expand_image_tokens
from aigv_assessor_tpu.data.conversation import get_conv_template
from aigv_assessor_tpu.data.video import load_video, transform_frames

logger = logging.getLogger(__name__)

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".gif")


def list_videos(path: str) -> List[str]:
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.lower().endswith(VIDEO_EXTS)
        ]
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(l)["video"] for l in f if l.strip()]
    return [path]


def build_prompt_ids(tokenizer, template_name, question, num_frames, num_image_token):
    """Stage-2 style scoring prompt: Frame{i} blocks + motion slot + question
    + an opened assistant turn (the score reads hidden[-4] of the full
    teacher-forced answer in eval; for serving we append the canonical answer
    template so the read-out position exists)."""
    blocks = "\n".join(f"Frame{i + 1}: <image>" for i in range(num_frames))
    q = blocks + "\nMotion Feature: <image>\n" + question
    conv = get_conv_template(template_name)
    conv.append_message(conv.roles[0], q)
    conv.append_message(conv.roles[1], "The quality of the video is good.")
    text = conv.get_prompt()
    text = expand_image_tokens(text, [num_image_token] * num_frames + [1])
    return tokenizer.encode(text)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_name_or_path", default="")
    ap.add_argument("--model_scale", default="auto",
                    choices=["auto", "tiny", "2b", "8b"])
    ap.add_argument("--videos", required=True)
    ap.add_argument(
        "--question", action="append", default=None,
        help="repeatable: each occurrence is one scoring perspective; all "
             "perspectives share one ViT/motion encode per video",
    )
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_segments", type=int, default=8)
    ap.add_argument("--out", default="scores.csv")
    ap.add_argument("--bf16", type=_bool, default=True)
    ap.add_argument("--max_seq_length", type=int, default=4096)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--mos_scale", type=float, default=100.0,
                    help="multiply model scores back to MOS range (stage-2 "
                         "trains on mos/100, stage2_train.py:613)")
    ap.add_argument("--normalize_type", default="imagenet",
                    choices=["imagenet", "clip", "siglip"])
    ap.add_argument("--device_preprocess", type=_bool, default=True,
                    help="decode at native size on host, fused bicubic "
                         "resize+normalize on device (ops/preprocess.py); "
                         "False = host PIL path (training parity)")
    ap.add_argument("--int8", type=_bool, default=False,
                    help="W8A16 serving: int8 LLM kernels (HBM footprint; "
                         "the load_in_8bit counterpart)")
    ap.add_argument("--w8a8", type=_bool, default=False,
                    help="int8 MXU compute in both towers (~1.8x bf16 "
                         "prefill/encode on v5e; ops/w8a8.py)")
    ap.add_argument("--int4", type=_bool, default=False,
                    help="W4A16 serving: nibble-packed int4 LLM kernels "
                         "unpacked in-kernel (the load_in_4bit counterpart)")
    ap.add_argument("--shared_prefix", type=_bool, default=True,
                    help="with >1 perspectives: prefill the common prompt "
                         "prefix (system turn + frame/motion tokens) ONCE "
                         "per video and run the per-perspective question "
                         "suffixes against the shared KV cache")
    args = ap.parse_args(argv)

    from aigv_assessor_tpu.cli.common import build_serving_stack

    config, model, params, tokenizer = build_serving_stack(
        model_name_or_path=args.model_name_or_path,
        model_scale=args.model_scale,
        max_seq_length=args.max_seq_length,
        bf16=args.bf16,
        int8=args.int8,
        int4=args.int4,
        w8a8=args.w8a8,
    )
    image_size = config.force_image_size or config.vision.image_size

    videos = list_videos(args.videos)
    questions = args.question or [
        "How would you rate the static quality of this video?"
    ]
    n_persp = len(questions)
    logger.info("scoring %d videos x %d perspectives", len(videos), n_persp)

    # one prompt per perspective, right-padded to a common length so the
    # whole [B, P, N] batch runs in one compiled program
    prompts = [
        build_prompt_ids(
            tokenizer, config.template, q, args.num_segments,
            config.num_image_token,
        )
        for q in questions
    ]
    max_n = max(len(p) for p in prompts)
    pad_id = tokenizer.pad_token_id
    ids_pn = np.full((n_persp, max_n), pad_id, np.int32)
    mask_pn = np.zeros((n_persp, max_n), bool)
    for i, p in enumerate(prompts):
        ids_pn[i, : len(p)] = p
        mask_pn[i, : len(p)] = True

    # longest common token prefix across the perspectives: the system turn +
    # every frame/motion <IMG_CONTEXT> token (the questions come after them).
    # Its LLM prefill runs once per video; only the question suffixes are
    # perspective-specific (score_perspectives shared_prefix_len).
    prefix_len = 0
    if args.shared_prefix and n_persp > 1:
        from aigv_assessor_tpu.cli.common import compute_shared_prefix_len

        prefix_len = compute_shared_prefix_len(
            prompts, config.img_context_token_id
        )
        if not prefix_len:
            logger.warning(
                "perspective prompts share no usable prefix; falling back "
                "to independent per-perspective prefills"
            )
        else:
            logger.info(
                "shared prompt prefix: %d of %d tokens prefilled once per "
                "video", prefix_len, max_n,
            )

    import jax.numpy as jnp

    @jax.jit
    def score_batch(params, input_ids, pixel_values, attention_mask):
        # [B, P, N] prompts share one frame encode per video; with a common
        # token prefix the LLM prefill over it is also shared (one prefill +
        # block-causal question suffixes instead of P full prefills)
        if pixel_values.dtype == jnp.uint8:
            # uint8 transport: 1/4 the h2d bytes, normalization fused here
            from aigv_assessor_tpu.ops.preprocess import resize_normalize

            pixel_values = resize_normalize(
                pixel_values, size=pixel_values.shape[-2],
                normalize_type=args.normalize_type,
                dtype=model.precision.compute_dtype,
            )
        return model.apply(
            params, input_ids, pixel_values, attention_mask,
            method="score_perspectives",
            shared_prefix_len=prefix_len or None,
        )

    # threaded decode ahead of the device
    from concurrent.futures import ThreadPoolExecutor

    def load_one(path):
        # aug-free scoring: scaled native decode straight to image_size
        # (libswscale during decode; PIL resize skipped downstream)
        frames = load_video(
            path, num_segments=args.num_segments, out_size=image_size
        )
        if args.device_preprocess:
            # uint8 stays on the host until the batch h2d; score_batch
            # normalizes in-jit. (The previous form normalized per video
            # on-device and pulled fp32 BACK for batching — a d2h+h2d
            # round trip per video that serialized on the tunneled link.)
            from aigv_assessor_tpu.data.video import frames_to_uint8

            return frames_to_uint8(frames, input_size=image_size)
        return transform_frames(frames, input_size=image_size)

    bs = args.batch_size
    chunks = [videos[i : i + bs] for i in range(0, len(videos), bs)]
    batch_ids = jnp.asarray(np.tile(ids_pn[None], (bs, 1, 1)))
    batch_mask = jnp.asarray(np.tile(mask_pn[None], (bs, 1, 1)))

    rows = []
    t_start = time.perf_counter()
    with ThreadPoolExecutor(args.workers) as pool:
        # two-chunk prefetch window: decode of chunk N+1/N+2 overlaps the
        # device compute of chunk N
        futures = {}

        def submit(ci):
            if ci < len(chunks) and ci not in futures:
                futures[ci] = [pool.submit(load_one, p) for p in chunks[ci]]

        submit(0)
        submit(1)

        def flush(chunk, scores_dev):
            # deferred device readback (this is the only sync point)
            scores = np.asarray(scores_dev)  # [bs, P]
            for j, path in enumerate(chunk):
                rows.append(
                    [path] + [float(s) * args.mos_scale for s in scores[j]]
                )

        pending = None
        for ci, chunk in enumerate(chunks):
            pixels = [f.result() for f in futures.pop(ci)]
            submit(ci + 2)
            if len(pixels) < bs:  # pad the tail to the compiled shape
                pixels = pixels + [pixels[-1]] * (bs - len(pixels))
            px = jnp.asarray(np.stack(pixels))
            scores_dev = score_batch(params, batch_ids, px, batch_mask)
            if pending is not None:
                flush(*pending)
            pending = (chunk, scores_dev)
        if pending is not None:
            flush(*pending)
    elapsed = time.perf_counter() - t_start

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        if n_persp == 1:
            w.writerow(["video_name", "pred_score"])
        else:
            w.writerow(
                ["video_name"] + [f"pred_score_{i + 1}" for i in range(n_persp)]
            )
        w.writerows(rows)
    print(
        json.dumps(
            {
                "metric": "videos_scored_per_sec",
                "value": round(len(videos) / max(elapsed, 1e-9), 3),
                "unit": "videos/sec",
                "n_videos": len(videos),
                "n_perspectives": n_persp,
                "perspective_scores_per_sec": round(
                    len(videos) * n_persp / max(elapsed, 1e-9), 3
                ),
                "out": args.out,
            }
        )
    )
    return rows


if __name__ == "__main__":
    main()
    sys.exit(0)
