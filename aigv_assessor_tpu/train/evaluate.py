"""Evaluation: teacher-forced quality-level decode (stage 1) and continuous
score regression (stage 2), with the reference's exact artifact contract.

Port of `CustomTrainer.evaluate` / `save_and_evaluate`
(`/root/reference/internvl/train/internvl/train/stage1_train.py:223-337`) and
the standalone eval entries (`internvl/eval/stage{1,2}_eval.py:893-962`):

- forward is teacher-forced (argmax at gold answer positions), NOT generative
  (`stage1_eval.py:933-941` comments out the generate path — SURVEY.md §3.3);
- the decoded span is the last `len(filtered)` answer positions where
  `filtered` drops -100 and the `<|im_end|>` id (`stage1_train.py:242-260`);
- quality word -> level 1..5 ('bad'..'excellent'), else 0;
- CSV columns `video_name,answer,output,mos,level` (+ `pred_score` for
  stage 2), metrics TXT appended with Accuracy/SRCC/PLCC/KRCC lines
  (`stage1_train.py:291-337`);
- accuracy = substring match `output in answer` (`stage1_train.py:307-310`).

TPU speedup over the reference's bs=1 GPU loop: batches are right-padded to a
static bucket and evaluated in parallel; per-sample spans are recovered from
the attention mask.
"""

from __future__ import annotations

import csv
import functools
import logging
import os
import time
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np
from scipy.stats import kendalltau, pearsonr, spearmanr

from aigv_assessor_tpu.data.constants import IGNORE_TOKEN_ID, QUALITY_LEVELS

logger = logging.getLogger(__name__)


def word_to_level(decoded: str) -> int:
    """'bad'->1 ... 'excellent'->5, 0 if none (reference
    `stage1_train.py:260-275`; checked in the reference's order so e.g.
    'bad' wins over 'good' appearing later)."""
    for word, level in QUALITY_LEVELS.items():
        if word in decoded:
            return level
    return 0


def decode_answer_span(
    tokenizer,
    pred_ids: np.ndarray,  # [S-1] argmax of shifted logits for one sample
    shift_labels: np.ndarray,  # [S-1]
    real_len: int,  # true (unpadded) sequence length S_real
    im_end_id: Optional[int],
) -> str:
    """Reference decode slice (`stage1_train.py:242-260`): with the unpadded
    sequence, `filtered` = answer labels minus -100/<|im_end|>, decoded from
    argmax predictions at the last len(filtered)+1..1 positions."""
    labels = shift_labels[: real_len - 1]
    preds = pred_ids[: real_len - 1]
    filtered = [
        x for x in labels.tolist() if x != IGNORE_TOKEN_ID and x != im_end_id
    ]
    n = len(filtered)
    if n == 0:
        return ""
    return tokenizer.decode(preds[-n - 1 : -1])


@functools.lru_cache(maxsize=8)
def _eval_forward(model, stage: int):
    @jax.jit
    def forward_fn(params, input_ids, pixel_values, attention_mask, labels, mos):
        out = model.apply(
            params,
            input_ids,
            pixel_values,
            attention_mask=attention_mask,
            labels=labels,
            mos=mos,
        )
        ret = {"pred": jax.numpy.argmax(out["logits"][:, :-1, :], axis=-1)}
        if stage >= 2:
            ret["score"] = out["score"]
        return ret

    return forward_fn


def evaluate_batches(
    model,
    params,
    batches: Iterable,
    tokenizer,
    stage: int = 1,
    forward_fn=None,
) -> List[List]:
    """Run the eval forward over collated `Batch`es; returns reference-format
    rows [video_name, answer, output, mos, level(, pred_score)]."""
    im_end_id = tokenizer.convert_tokens_to_ids("<|im_end|>")
    if forward_fn is None:
        # cached per (model, stage): a fresh @jax.jit closure per eval call
        # would retrace the full forward at EVERY periodic eval (2B-scale
        # compiles take minutes through the tunnel)
        forward_fn = _eval_forward(model, stage)

    rows: List[List] = []
    for batch in batches:
        out = forward_fn(
            params,
            batch.input_ids,
            batch.pixel_values,
            batch.attention_mask,
            batch.labels,
            batch.mos,
        )
        preds = np.asarray(out["pred"])
        scores = np.asarray(out["score"]) if stage >= 2 else None
        shift_labels = batch.labels[:, 1:]
        real_lens = batch.attention_mask.sum(axis=1)
        for i in range(preds.shape[0]):
            decoded = decode_answer_span(
                tokenizer, preds[i], shift_labels[i], int(real_lens[i]), im_end_id
            )
            level = word_to_level(decoded)
            row = [
                batch.video_names[i],
                batch.answers[i],
                decoded,
                float(batch.mos[i]),
                level,
            ]
            if stage >= 2:
                row.append(float(scores[i]))
            rows.append(row)
    return rows


@functools.lru_cache(maxsize=8)
def _persp_forward(model, shared_prefix_len=None, normalize_type="imagenet"):
    import jax.numpy as jnp

    compute_dtype = model.precision.compute_dtype

    @jax.jit
    def forward_fn(params, input_ids, pixel_values, attention_mask):
        if pixel_values.dtype == jnp.uint8:
            # uint8 transport: frames cross the link at 1/4 the fp32
            # bytes; [0,1] + mean/std normalization fuses into the jit
            # (same scheme as cli/serve.py — the round-5 fused-eval
            # profile measured the fp32 pixel h2d as the binding term)
            from aigv_assessor_tpu.ops.preprocess import resize_normalize

            pixel_values = resize_normalize(
                pixel_values, size=pixel_values.shape[-2],
                normalize_type=normalize_type, dtype=compute_dtype,
            )
        return model.apply(
            params, input_ids, pixel_values, attention_mask,
            method="score_perspectives",
            shared_prefix_len=shared_prefix_len,
        )

    return forward_fn


def evaluate_perspectives(
    model,
    params,
    datasets,  # P VideoQualityDatasets over the SAME videos (paired by index)
    batch_size: int = 8,
    workers: int = 4,
    timing_out: dict | None = None,
):
    """Fused multi-perspective stage-2 evaluation.

    The reference evaluates its 4 quality perspectives as 4 SEPARATE full
    eval runs over the same videos (`shell/train/stage2_train.sh:13`
    `export number=...` selects the per-perspective annotation; each run
    re-decodes and re-encodes the identical frames). Here the P datasets
    are paired by index, every video is decoded and ViT/motion-encoded
    ONCE, and the P perspective prompts batch through the LLM against the
    shared embeddings (`AIGVAssessor.score_perspectives`).

    Returns P row-lists `[video_name, answer, mos, pred_score]` — the
    score-based artifact (the reference's text `output` column requires a
    per-perspective LM-head pass, defeating the fusion; the quality metric
    of record for stage-2 is SRCC/PLCC/KRCC over `pred_score`).
    """
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    p_count = len(datasets)
    n = len(datasets[0])
    assert all(len(d) == n for d in datasets), "perspective datasets differ in size"
    for pi, d in enumerate(datasets):
        if not hasattr(d, "get_text_item"):
            # build_datasets returns a WeightedConcatDataset for multi-entry
            # metas; the fused evaluator pairs videos by index across the P
            # metas, which only makes sense for one dataset per perspective
            raise ValueError(
                f"fused eval perspective {pi}: meta resolves to "
                f"{type(d).__name__}; --fused_meta_paths requires each "
                "perspective meta to contain exactly ONE dataset entry "
                "(run multi-entry metas through the solo eval path)"
            )
    texts = [[d.get_text_item(i) for i in range(n)] for d in datasets]
    for pi in range(1, p_count):
        for i in range(n):
            assert texts[pi][i].video_name == texts[0][i].video_name, (
                f"perspective {pi} sample {i} pairs a different video "
                f"({texts[pi][i].video_name!r} vs {texts[0][i].video_name!r})"
            )

    # the preprocess functions pad input_ids to model_max_length; batch at
    # the max REAL length instead — the shared-prefix suffix pass rides ONE
    # [B, P*s_suf] sequence axis, so carrying tokenizer padding multiplies
    # the suffix attention quadratically (measured: 4096-padded prompts made
    # P*s_suf=7864 and a 9.4 GB logits buffer; real suffixes are ~60 tokens)
    real_lens = [
        [int(t.attention_mask.sum()) for t in row] for row in texts
    ]
    max_n = max(max(r) for r in real_lens)
    max_n = -(-max_n // 8) * 8  # pad to a lane-friendly multiple

    # the prompts share system turn + Frame/motion context tokens across
    # EVERY (video, perspective) — only the question + teacher-forced answer
    # differ after them — so the LLM prefill over that prefix runs once per
    # video (same contract and guards as cli/score.py shared_prefix)
    from aigv_assessor_tpu.cli.common import compute_shared_prefix_len

    flat = [
        t.input_ids[: real_lens[pi][i]]
        for pi, row in enumerate(texts)
        for i, t in enumerate(row)
    ]
    prefix_len = compute_shared_prefix_len(
        flat, model.config.img_context_token_id
    )
    uint8_ok = getattr(
        datasets[0], "supports_uint8_pixels", lambda: False
    )()
    forward_fn = _persp_forward(
        model, prefix_len or None,
        normalize_type=getattr(datasets[0], "normalize_type", "imagenet"),
    )
    rows = [[] for _ in range(p_count)]
    idx_chunks = [
        list(range(i, min(i + batch_size, n))) for i in range(0, n, batch_size)
    ]

    def pixels_for(i):
        # decode ONCE per video, from the first perspective's dataset —
        # decode-only (the tokens already came from get_text_item);
        # uint8 on aug-free paths (normalization fused into forward_fn)
        if uint8_ok:
            return datasets[0].get_pixel_item_uint8(i)
        return datasets[0].get_pixel_item(i)

    with ThreadPoolExecutor(workers) as pool:
        futures = {}

        def submit(ci):
            if ci < len(idx_chunks) and ci not in futures:
                futures[ci] = [
                    pool.submit(pixels_for, i) for i in idx_chunks[ci]
                ]

        submit(0)
        submit(1)
        batch_marks = []  # (wall time after batch ci read back, videos done)
        done = 0
        t_start = time.perf_counter()
        pending = None  # one-deep readback pipeline: the device computes

        def flush(p):
            # batch ci while batch ci+1's pixels decode and transfer
            nonlocal done
            p_idxs, out = p
            scores = np.asarray(out)  # [b, P]
            done += len(p_idxs)
            batch_marks.append((time.perf_counter(), done))
            for bi, i in enumerate(p_idxs):
                for pi in range(p_count):
                    t = texts[pi][i]
                    rows[pi].append(
                        [t.video_name, t.answer, float(t.mos),
                         float(scores[bi, pi])]
                    )

        for ci, idxs in enumerate(idx_chunks):
            pixels = [f.result() for f in futures.pop(ci)]
            submit(ci + 2)
            b = len(idxs)
            ids = np.zeros((b, p_count, max_n), np.int32)
            mask = np.zeros((b, p_count, max_n), bool)
            for bi, i in enumerate(idxs):
                for pi in range(p_count):
                    t = texts[pi][i]
                    ln = real_lens[pi][i]
                    ids[bi, pi, :ln] = t.input_ids[:ln]
                    mask[bi, pi, :ln] = True
            px = np.stack(pixels)
            out = forward_fn(
                params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask)
            )  # async dispatch
            if pending is not None:
                flush(pending)
            pending = (idxs, out)
        if pending is not None:
            flush(pending)
    if timing_out is not None and batch_marks:
        timing_out["total_s"] = batch_marks[-1][0] - t_start
        timing_out["videos"] = batch_marks[-1][1]
        if len(batch_marks) > 1:
            # steady state: drop the first batch (it carries jit compile)
            t1, v1 = batch_marks[0]
            timing_out["steady_s"] = batch_marks[-1][0] - t1
            timing_out["steady_videos"] = batch_marks[-1][1] - v1
    return rows


def save_perspective_results(
    rows,  # [video_name, answer, mos, pred_score]
    output_file: str,
    metrics_file: str,
):
    """Per-perspective artifacts for the fused evaluator: pred_score CSV +
    the stage-2 score-correlation metrics block (`stage2_eval.py:676-685`)."""
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_name", "answer", "mos", "pred_score"])
        w.writerows(rows)
    mos = [r[2] for r in rows]
    pred = [r[3] for r in rows]
    corr = correlation_metrics(mos, pred)
    with open(metrics_file, "a") as f:
        f.writelines(
            [
                f"SRCC_score: {corr['SRCC']}\n",
                f"PLCC_score: {corr['PLCC']}\n",
                f"KRCC_score: {corr['KRCC']}\n",
            ]
        )
    return {f"{k}_score": v for k, v in corr.items()}


def correlation_metrics(x: Sequence[float], y: Sequence[float]) -> Dict[str, float]:
    srcc, _ = spearmanr(x, y)
    plcc, _ = pearsonr(x, y)
    krcc, _ = kendalltau(x, y)
    return {"SRCC": float(srcc), "PLCC": float(plcc), "KRCC": float(krcc)}


def save_and_evaluate(
    rows: List[List],
    output_file: str = "results.csv",
    metrics_file: str = "metrics.txt",
    stage: int = 1,
) -> Dict[str, float]:
    """Write the CSV + append-mode metrics TXT with the exact reference
    format (`stage1_train.py:291-337`, `stage2_train.py:311` adds
    pred_score; `stage2_eval.py:676-685` adds score-based correlations)."""
    columns = ["video_name", "answer", "output", "mos", "level"]
    if stage >= 2:
        columns.append("pred_score")
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(columns)
        w.writerows(rows)
    logger.info("results saved to %s", output_file)

    total = len(rows)
    right = sum(1 for r in rows if r[2] in r[1])
    accuracy = right / max(total, 1)

    mos_values = [r[3] for r in rows]
    levels = [r[4] for r in rows]
    metrics = {"accuracy": accuracy, **correlation_metrics(mos_values, levels)}

    lines = [
        f"Accuracy: {accuracy}\n",
        f"SRCC: {metrics['SRCC']}\n",
        f"PLCC: {metrics['PLCC']}\n",
        f"KRCC: {metrics['KRCC']}\n",
    ]
    if stage >= 2:
        pred_scores = [r[5] for r in rows]
        score_corr = correlation_metrics(mos_values, pred_scores)
        metrics.update({f"{k}_score": v for k, v in score_corr.items()})
        lines += [
            f"SRCC_score: {score_corr['SRCC']}\n",
            f"PLCC_score: {score_corr['PLCC']}\n",
            f"KRCC_score: {score_corr['KRCC']}\n",
        ]
    with open(metrics_file, "a") as f:
        f.writelines(lines)
    for k, v in metrics.items():
        logger.info("%s: %s", k, v)
    return metrics
