"""Benchmark: flagship stage-2 scoring pipeline, videos scored/sec/chip.

Headline metric (BASELINE.json north star): one jitted forward of the
composite model — ViT-300M encode of 8 frames + SlowFast motion + InternLM2
teacher-forced pass + mlpscore read-out — at the InternVL2-2B scale
(ViT-300M + InternLM2-1.8B), seq 2113, bf16, score-only serving path
(with_logits=False). Extra fields on the same JSON line:

- `perspectives_scored_per_sec_chip` + `fused_speedup_vs_4x`: the
  4-perspective fused path (`AIGVAssessor.score_perspectives`, one shared
  ViT/motion encode per video) vs 4x the single-perspective cost — the
  reference runs 4 SEPARATE full evals for its "4 perspectives"
  (`shell/train/stage2_train.sh:13`, SURVEY §0).
- `vit_encode_frames_per_sec`: ViT-300M encode at bs=64 (BASELINE #3).
- `train_samples_per_sec` / `lora_train_samples_per_sec`: stage-1 and
  stage-2(LoRA) jitted train steps (BASELINE #4/#5 single-chip analogs).
- `decode_tokens_per_sec`: 2B bs=1 fixed-cache decode loop.

Timing protocol (medians): the axon-tunneled chip's `block_until_ready`
does not fence, so every timed region ends in a scalar host readback that
depends on all queued work; the readback RTT is measured and subtracted.
Each measurement is a chained in-program loop repeated R times; the
REPORTED value is the median, with min/max recorded in `spread` (the
tunnel's run-to-run throughput fluctuates ~2x — BENCH_NOTES.md traps).

vs_baseline: the reference publishes NO numbers (BASELINE.md); the
comparison is an analytic A100 estimate at a generous 45% MFU
(312*0.45/15 TFLOP = 9.36 videos/s; ViT 198 frames/s — BENCH_NOTES.md).

Set AIGV_BENCH_FAST=1 to emit only the headline + ViT metrics (~4 min).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REF_VIDEOS_PER_SEC = 9.36
A100_REF_FRAMES_PER_SEC = 198.0


def _is_tpu() -> bool:
    if jax.default_backend() == "tpu":
        return True
    return "tpu" in getattr(jax.devices()[0], "device_kind", "").lower()


def _timeit(probe, args, iters, repeats=3):
    """Chained-iteration timing with readback-RTT subtraction; returns
    (median_per_iter, [per_iter samples])."""
    s = float(probe(*args))
    assert np.isfinite(s), s
    t0 = time.perf_counter()
    _ = float(probe(*args))
    rtt_plus_one = time.perf_counter() - t0
    samples = []
    for _r in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = probe(*args)
        total = float(out)  # syncs the whole in-order queue
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        per_iter = (dt - rtt_plus_one) / (iters - 1) if iters > 1 else dt
        samples.append(max(per_iter, 1e-9))
    return float(np.median(samples)), samples


def _zero_params_like(shapes, dtype=jnp.bfloat16):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if s.dtype == jnp.int8 else dtype),
        shapes,
    )


def _random_params_like(shapes, seed=0, score_head_std=0.06):
    """Name-aware host-side random init (numpy, fp32): kernels/embeddings
    ~ N(0, 0.02), norm/BN scales 1, everything else 0. Orders of magnitude
    faster than model.init on a 1-core host and sufficient for a
    quantization-DRIFT measurement (drift depends on activation statistics,
    not on init-distribution details). mlpscore kernels get a wider std so
    the final-ReLU score head produces varying, mostly-positive scores."""
    from flax import traverse_util

    rng = np.random.default_rng(seed)
    flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda s: s, shapes)
    )
    out = {}
    for k, s in flat.items():
        name = str(k[-1])
        path = "/".join(map(str, k))
        if name in ("kernel", "embedding") or name.startswith("kernel_"):
            std = score_head_std if "mlpscore" in path else 0.02
            out[k] = rng.normal(0.0, std, s.shape).astype(np.float32)
        elif name in ("scale", "gamma", "var", "kernel_scale", "weight"):
            # "weight" is this repo's RMSNorm scale (models/internlm2.py:51,
            # models/vit.py:44) — zeros here zero every hidden state and
            # make the scores constant (the round-5 'degenerate scores' bug)
            out[k] = np.ones(s.shape, np.float32)
        elif name in ("ls1", "ls2"):
            # LayerScale: zeros would detach every ViT residual branch
            out[k] = np.full(s.shape, 0.1, np.float32)
        else:
            out[k] = np.zeros(s.shape, np.float32)
    return traverse_util.unflatten_dict(out)


def bench_w8a8_quality(on_tpu: bool):
    """Serving-width SRCC-invariance gate (round-5 verdict task 2): scores
    64 synthetic videos bf16 vs W8A8 at the REAL 2B layer widths (depth cut
    to 8/8 layers — int8 error scales with contraction width, which is
    preserved) and reports rank-order agreement:

    - w8a8_srcc: SRCC(scores_bf16, scores_w8a8), gate >= 0.995
    - w8a8_srcc_delta: |SRCC_vs_mos(w8a8) - SRCC_vs_mos(bf16)| against a
      synthetic ground truth rank-correlated with the bf16 scores,
      gate <= 0.005 (the reference's metric protocol computes SRCC of
      pred_score vs mos, `eval/stage2_eval.py:676-685`)."""
    import dataclasses

    from scipy.stats import spearmanr

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.models.loading import quantize_for_serving

    if on_tpu:
        cfg = AssessorConfig(
            llm=dataclasses.replace(LLM_2B, num_hidden_layers=8),
            stage=2,
        ).replace(img_context_token_id=7)
        cfg = cfg.replace(
            vision=dataclasses.replace(cfg.vision, num_hidden_layers=8)
        )
        image, t, text_len, bs = 448, 8, 64, 8
        cdt = jnp.bfloat16
        prec = Precision()
    else:
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=7)
        image, t, text_len, bs = 56, 4, 32, 4
        cdt = jnp.float32
        prec = Precision.fp32()

    model = AIGVAssessor(cfg, prec)
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + text_len
    n = 64
    rng = np.random.default_rng(0)
    # PER-VIDEO token tails: with one shared prompt, a random-init (un-
    # amplifying) model in bf16 leaves the per-video pixel deltas at the -4
    # readout position below bf16 resolution -> constant scores (measured:
    # 'degenerate scores' on-chip). Distinct tails vary the activations
    # being quantized, which is exactly what a drift measurement needs.
    ids_all = rng.integers(10, cfg.llm.vocab_size, (n, seq))
    ids_all[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    ids_all = jnp.asarray(ids_all, jnp.int32)
    px0 = jnp.zeros((bs, t, image, image, 3), cdt)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), ids_all[:bs], px0
    )
    host = _random_params_like(shapes, seed=3)
    qhost, qprec = quantize_for_serving(host, prec, w8a8=True)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            x, cdt if x.dtype == np.float32 else x.dtype
        ),
        host,
    )
    qparams = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            x, cdt if x.dtype == np.float32 else x.dtype
        ),
        qhost,
    )
    del host, qhost
    qmodel = AIGVAssessor(cfg, qprec)

    fb = jax.jit(
        lambda p, i, x: model.apply(p, i, x, with_logits=False)["score"]
    )
    fq = jax.jit(
        lambda p, i, x: qmodel.apply(p, i, x, with_logits=False)["score"]
    )
    vid_rng = np.random.default_rng(7)
    s_b, s_q = [], []
    for i in range(0, n, bs):
        ids = ids_all[i : i + bs]
        px = jnp.asarray(
            vid_rng.normal(size=(bs, t, image, image, 3)), cdt
        )
        s_b.append(np.asarray(fb(params, ids, px), np.float64))
        s_q.append(np.asarray(fq(qparams, ids, px), np.float64))
    s_b, s_q = np.concatenate(s_b), np.concatenate(s_q)
    assert s_b.std() > 1e-4, "degenerate scores"
    srcc = float(spearmanr(s_b, s_q).statistic)
    mos = s_b + vid_rng.normal(size=n) * 0.5 * s_b.std()
    delta = float(
        abs(spearmanr(s_b, mos).statistic - spearmanr(s_q, mos).statistic)
    )
    return srcc, delta


def bench_host_decode(out_size: int = 448, n_videos: int = 12):
    """Host-side scaled native decode rate (frames/sec): the eval/score
    ingest path after round-5 task 3 (decode straight to 448 via libswscale
    instead of native-size decode + PIL resize)."""
    from aigv_assessor_tpu.data import native_decode
    from aigv_assessor_tpu.data.video import load_video

    if not native_decode.available():
        return None
    import cv2

    path = "/tmp/aigv_bench_decode.mp4"
    if not os.path.exists(path):
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (1280, 720)
        )
        r = np.random.default_rng(0)
        for _t in range(48):
            vw.write(r.integers(0, 255, (720, 1280, 3), np.uint8))
        vw.release()
    # warm the file cache
    load_video(path, num_segments=8, out_size=out_size)
    t0 = time.perf_counter()
    for _ in range(n_videos):
        frames = load_video(path, num_segments=8, out_size=out_size)
    dt = time.perf_counter() - t0
    assert frames[0].size == (out_size, out_size)
    return 8 * n_videos / dt


def _pipeline_setup(
    on_tpu: bool,
    stage: int = 2,
    batch: int | None = None,
    w8a8: bool = False,
):
    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor

    if on_tpu:
        cfg = AssessorConfig(llm=LLM_2B, stage=stage).replace(
            img_context_token_id=7
        )
        image, b, t, text_len = 448, batch or 4, 8, 64
    else:
        cfg = AssessorConfig.tiny(stage=stage).replace(img_context_token_id=7)
        image, b, t, text_len = 56, batch or 2, 4, 32

    # CPU smoke runs fp32: the CPU backend's DotThunk has no bf16 path
    prec, fdt = (Precision(), jnp.bfloat16) if on_tpu else (
        Precision.fp32(), jnp.float32)
    if w8a8:
        # int8 MXU compute in both towers (`ops/w8a8.py`; measured 1.7-2x
        # bf16 on these shapes — benchmarks/int8_xla_probe.py round 4)
        import dataclasses

        prec = dataclasses.replace(prec, w8a8=True)
    model = AIGVAssessor(cfg, prec)
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + text_len
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.llm.vocab_size, (b, seq))
    ids[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    px = jnp.asarray(rng.normal(size=(b, t, image, image, 3)), fdt)
    mask = jnp.ones((b, seq), bool)

    # zero-init via eval_shape: instant, timing-equivalent for dense matmuls
    shapes = jax.eval_shape(model.init, jax.random.key(0), ids, px)
    params = _zero_params_like(shapes, fdt)
    return cfg, model, params, ids, px, mask, seq, (b, t, image)


def bench_pipeline(on_tpu: bool, batch: int | None = None, w8a8: bool = False):
    """Flagship: videos scored/sec/chip at 2B scale (tiny on CPU smoke).
    Also returns the per-batch time for the fused-speedup comparison."""
    cfg, model, params, ids, px, mask, seq, (b, t, image) = _pipeline_setup(
        on_tpu, batch=batch, w8a8=w8a8
    )

    @jax.jit
    def probe(params, ids, px, mask):
        out = model.apply(
            params, ids, px, attention_mask=mask, with_logits=False
        )
        return jnp.sum(out["score"].astype(jnp.float32))

    iters = 8 if on_tpu else 3
    per_iter, samples = _timeit(probe, (params, ids, px, mask), iters)
    return b / per_iter, seq, per_iter / b, samples, (
        cfg, model, params, ids, px, mask, b,
    )


def bench_perspectives(on_tpu: bool, setup, single_video_time: float):
    """4-perspective fused scoring: one shared frame encode AND one shared
    LLM prefill per video; only the question suffixes (last `suffix` tokens,
    like the score CLI's prompts) run per-perspective, block-causal against
    the shared KV cache."""
    cfg, model, params, ids, px, mask, b = setup
    p = 4
    suffix = 56 if on_tpu else 16
    prefix_len = int(ids.shape[1]) - suffix
    ids_p = jnp.tile(ids[:, None, :], (1, p, 1))
    tails = np.random.default_rng(1).integers(
        10, cfg.llm.vocab_size, (1, p, suffix)
    )
    ids_p = ids_p.at[:, :, prefix_len:].set(jnp.asarray(tails, jnp.int32))
    mask_p = jnp.tile(mask[:, None, :], (1, p, 1))

    @jax.jit
    def probe(params, ids_p, px, mask_p):
        s = model.apply(
            params, ids_p, px, mask_p, method="score_perspectives",
            shared_prefix_len=prefix_len,
        )
        return jnp.sum(s.astype(jnp.float32))

    iters = 4 if on_tpu else 2
    per_iter, samples = _timeit(probe, (params, ids_p, px, mask_p), iters)
    per_video_4p = per_iter / b
    persp_per_sec = b * p / per_iter
    speedup_vs_4x = (4.0 * single_video_time) / per_video_4p
    return persp_per_sec, speedup_vs_4x, samples


def bench_vit(on_tpu: bool, w8a8: bool = False):
    """Secondary: ViT-300M encode frames/sec at bs=64."""
    import dataclasses

    from aigv_assessor_tpu.core.config import VisionConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.vit import InternVisionModel

    cfg = VisionConfig() if on_tpu else VisionConfig.tiny()
    batch = 64 if on_tpu else 8
    prec = Precision() if on_tpu else Precision.fp32()
    if w8a8:
        prec = dataclasses.replace(prec, w8a8=True)
    model = InternVisionModel(cfg, prec)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(batch, cfg.image_size, cfg.image_size, 3)
        ),
        jnp.bfloat16 if on_tpu else jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def probe(params, x):
        return jnp.sum(model.apply(params, x).astype(jnp.float32))

    per_iter, _ = _timeit(probe, (params, x), 20 if on_tpu else 3)
    return batch / per_iter


def bench_train_step(on_tpu: bool, stage: int, vit_remat_policy=None):
    """Stage-1 (projector) / stage-2 (LoRA) jitted train step, samples/sec
    (BASELINE #4/#5 single-chip analogs). vit_remat_policy: selective remat
    for the ViT tower (ViT-LoRA backward otherwise recomputes the whole
    encoder — 1.18 s/step vs 0.578 LLM-only, BENCH_NOTES round 3)."""
    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.train.trainer import TrainConfig, Trainer, microbatch

    if on_tpu:
        cfg = AssessorConfig(llm=LLM_2B, stage=stage).replace(
            img_context_token_id=7,
            use_backbone_lora=8 if stage == 2 else 0,
            use_llm_lora=8 if stage == 2 else 0,
        )
        image, b, t, text_len, iters = 448, 2, 8, 64, 4
    else:
        cfg = AssessorConfig.tiny(stage=stage).replace(
            img_context_token_id=7,
            use_backbone_lora=2 if stage == 2 else 0,
            use_llm_lora=2 if stage == 2 else 0,
        )
        image, b, t, text_len, iters = 56, 2, 4, 32, 2

    model = AIGVAssessor(
        cfg, Precision() if on_tpu else Precision.fp32(), remat=True,
        vit_remat_policy=vit_remat_policy,
    )
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + text_len
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.llm.vocab_size, (b, seq))
    ids[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    labels = np.full((b, seq), -100)
    labels[:, -16:] = rng.integers(10, cfg.llm.vocab_size, (b, 16))
    batch = {
        "input_ids": ids.astype(np.int32),
        "labels": labels.astype(np.int32),
        "attention_mask": np.ones((b, seq), bool),
        "pixel_values": rng.normal(size=(b, t, image, image, 3)).astype(
            np.float32
        ),
        "mos": rng.uniform(0, 1, (b,)).astype(np.float32),
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            labels=jnp.asarray(batch["labels"]),
            mos=jnp.asarray(batch["mos"]),
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32), shapes
    )
    # stage 2: towers frozen, LoRA adapters (from the model config) +
    # mlpscore trainable (make_trainable_mask handles the partition)
    tcfg = TrainConfig(
        learning_rate=1e-4,
        warmup_ratio=0.0,
        lr_scheduler_type="constant",
        grad_checkpoint=True,
        output_dir="/tmp/aigv_bench_train",
    )
    trainer = Trainer(model, params, tcfg, total_steps=64)
    # the trainer re-casts the frozen partition to bf16 — drop our fp32
    # originals or both trees stay live and OOM the 16 GB chip
    del params, shapes
    step = trainer.compiled_step()
    # ship the microbatch to the device ONCE: feeding host numpy re-sends
    # ~38 MB per step through the tunnel, whose bandwidth oscillates ~6x on
    # ~1 min periods — it turned the slope samples bimodal (0.6 vs 4.0
    # s/step). Real training prefetches via the data loader, so the step
    # bench should measure device throughput (0.431 s/step, stable ±0.5%).
    mb = jax.device_put(microbatch(batch, 1))
    key = jax.random.key(0)

    state = trainer.state

    state_box = [state]

    def run_loop(n):
        # the compiled step DONATES its state argument — always feed the
        # returned state back in (reusing a donated buffer raises)
        st = state_box[0]
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            st, loss = step(st, mb, key)
        _ = float(loss)  # sync
        state_box[0] = st
        return time.perf_counter() - t0

    run_loop(1)  # compile + warm
    # slope between loops of n and 3n steps cancels the fixed
    # dispatch/readback overhead (BENCH_NOTES.md round-3 trap)
    run_loop(iters)  # throwaway: the first post-warm loop pays one-off
    # donated-buffer setup and tunnel stalls (observed slope<=0 otherwise)
    samples = []
    for _r in range(3):
        t1 = run_loop(iters)
        t2 = run_loop(3 * iters)
        samples.append(max((t2 - t1) / (2 * iters), 1e-9))
    per_step = float(np.median(samples))
    return b / per_step, samples


def bench_decode(on_tpu: bool, int4: bool = False, kv_int8: bool = False,
                 batch: int = 1):
    """2B fixed-cache decode loop, batch-aggregate tokens/sec. int4=True
    runs the W4A16 serving path (nibble-packed weights, in-kernel unpack) —
    the only measured config past the 217 tok/s bf16 weight-bandwidth
    ceiling. kv_int8=True stores the cache int8 (`ops/kv_quant.py`): at
    batched decode the per-sample cache read rivals the batch-amortized
    weight stream, so halving it compounds with int4 weights
    (BENCH_NOTES.md round 3: bs=8 1300 -> 1559, bs=32 2338 -> 3373)."""
    import dataclasses

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.models.generation import GenerationConfig, decode_loop
    from aigv_assessor_tpu.models.internlm2 import KVCache

    if on_tpu:
        cfg = AssessorConfig(llm=LLM_2B, stage=1).replace(img_context_token_id=7)
        prefill, new_tokens, img = 2097, 64, 448
    else:
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=7)
        prefill, new_tokens, img = 32, 8, 56

    prec, fdt = (Precision(), jnp.bfloat16) if on_tpu else (
        Precision.fp32(), jnp.float32)
    if int4:
        prec = dataclasses.replace(prec, int4_weights=True)
    if kv_int8:
        prec = dataclasses.replace(prec, kv_int8=True)
    model = AIGVAssessor(cfg, prec)
    b = batch
    maxlen = prefill + new_tokens
    shapes = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.zeros((b, 4), jnp.int32),
        jnp.zeros((b, 1, img, img, 3), fdt),
    )
    params = _zero_params_like(shapes, fdt)
    cache = KVCache.init(cfg.llm, b, maxlen, quantized=kv_int8)
    cache = KVCache(k=cache.k, v=cache.v, index=jnp.asarray(prefill, jnp.int32))
    kv_mask = jnp.ones((b, maxlen), bool)
    start = jnp.full((b,), prefill, jnp.int32)
    first = jnp.zeros((b,), jnp.int32)
    rng = jax.random.key(0)
    gcfg = GenerationConfig(max_new_tokens=new_tokens, eos_token_id=-1)

    def run():
        return decode_loop(
            model, params, first, cache, start, kv_mask, rng, gcfg
        )

    t_ = run()
    np.asarray(t_)  # compile+warm
    samples = []
    for _r in range(3):
        t0 = time.perf_counter()
        toks = run()
        np.asarray(toks)
        dt = time.perf_counter() - t0
        samples.append(b * new_tokens / dt)
    return float(np.median(samples)), samples


def main() -> None:
    # persist compiled programs across bench runs (identical executables;
    # timing loops exclude compile anyway — this only cuts wall-clock)
    from aigv_assessor_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = _is_tpu()
    fast = os.environ.get("AIGV_BENCH_FAST", "0") == "1"

    import gc

    videos_per_sec, seq, single_video_time, pipe_samples, setup = (
        bench_pipeline(on_tpu)
    )
    vit_fps = bench_vit(on_tpu)
    record = {
        "metric": "videos_scored_per_sec_chip",
        "value": round(videos_per_sec, 3),
        "unit": "videos/sec/chip",
        "vs_baseline": round(videos_per_sec / A100_REF_VIDEOS_PER_SEC, 3),
        "config": f"2B stage-2 scoring, 8 frames 448px, seq {seq}, bs=4, bf16"
        if on_tpu
        else "tiny CPU smoke",
        "protocol": "median of 3 chained-loop repeats, RTT-subtracted",
        "spread": [round(min(pipe_samples), 4), round(max(pipe_samples), 4)],
        "vit_encode_frames_per_sec": round(vit_fps, 2),
        "vit_vs_baseline": round(vit_fps / A100_REF_FRAMES_PER_SEC, 3),
    }

    persp_best = None
    if not fast:
        try:
            persp_ps, speedup, _ = bench_perspectives(
                on_tpu, setup, single_video_time
            )
            record["perspectives_scored_per_sec_chip"] = round(persp_ps, 3)
            record["fused_speedup_vs_4x"] = round(speedup, 3)
            persp_best = persp_ps
        except Exception as e:  # pragma: no cover
            record["perspectives_error"] = repr(e)[:200]
        # free the ~5 GB of pipeline params before the next sections —
        # keeping them alive OOMs the 16 GB chip under the fp32 train state
        del setup
        gc.collect()
        jax.clear_caches()

        # ---- W8A8 (int8 MXU) scoring: the post-bf16-roofline lever ----
        # int8 x int8 -> int32 runs natively at ~1.8x the bf16 MXU rate on
        # v5e (benchmarks/int8_xla_probe.py). If faster, it becomes the
        # headline; bf16 numbers stay on the line for continuity.
        try:
            w8_vps, _, w8_svt, w8_samples, w8_setup = bench_pipeline(
                on_tpu, w8a8=True
            )
            record["videos_scored_per_sec_chip_w8a8"] = round(w8_vps, 3)
            try:
                w8_persp, w8_speedup, _ = bench_perspectives(
                    on_tpu, w8_setup, w8_svt
                )
                record["perspectives_scored_per_sec_chip_w8a8"] = round(
                    w8_persp, 3
                )
                if persp_best is None or w8_persp > persp_best:
                    persp_best = w8_persp
            except Exception as e:  # pragma: no cover
                record["perspectives_w8a8_error"] = repr(e)[:200]
            del w8_setup
            if w8_vps > videos_per_sec:
                record["videos_scored_per_sec_bf16"] = record["value"]
                record["value"] = round(w8_vps, 3)
                record["vs_baseline"] = round(
                    w8_vps / A100_REF_VIDEOS_PER_SEC, 3
                )
                record["spread"] = [
                    round(min(w8_samples), 4), round(max(w8_samples), 4),
                ]
                record["config"] = record["config"].replace("bf16", "w8a8")
        except Exception as e:  # pragma: no cover
            record["w8a8_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()
        try:
            vit_w8 = bench_vit(on_tpu, w8a8=True)
            record["vit_encode_frames_per_sec_w8a8"] = round(vit_w8, 2)
            if vit_w8 > vit_fps:
                record["vit_vs_baseline"] = round(
                    vit_w8 / A100_REF_FRAMES_PER_SEC, 3
                )
        except Exception as e:  # pragma: no cover
            record["vit_w8a8_error"] = repr(e)[:200]

        # ---- protocol-level metric: videos FULLY assessed (4 perspectives,
        # the paper's workload). The reference runs 4 separate full evals
        # (`shell/train/stage2_train.sh:13`, SURVEY §0), so its protocol
        # rate is A100_REF / 4.
        if persp_best is not None:
            v4 = persp_best / 4.0
            record["videos_assessed_4persp_per_sec"] = round(v4, 3)
            record["protocol_speedup"] = round(
                v4 / (A100_REF_VIDEOS_PER_SEC / 4.0), 3
            )
        gc.collect()
        try:
            tput, _ = bench_train_step(on_tpu, stage=1)
            record["train_samples_per_sec"] = round(tput, 3)
        except Exception as e:  # pragma: no cover
            record["train_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()  # drop executables + their donated train state
        try:
            tput, _ = bench_train_step(on_tpu, stage=2)
            record["lora_train_samples_per_sec"] = round(tput, 3)
        except Exception as e:  # pragma: no cover
            record["lora_train_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()
        try:
            # selective ViT remat: save dot outputs instead of recomputing
            # the whole encoder for the ViT adapters' backward
            tput, _ = bench_train_step(
                on_tpu, stage=2,
                vit_remat_policy="dots_with_no_batch_dims_saveable",
            )
            record["lora_train_samples_per_sec_selective_remat"] = round(
                tput, 3
            )
            if tput > record.get("lora_train_samples_per_sec", 0):
                record["lora_train_samples_per_sec_full_remat"] = record.get(
                    "lora_train_samples_per_sec"
                )
                record["lora_train_samples_per_sec"] = round(tput, 3)
        except Exception as e:  # pragma: no cover
            # structured refutation record (round-5 verdict task 6): this
            # lever is measured-REFUTED for 16 GB v5e, not merely crashed
            low_mem = any(
                s in repr(e)
                for s in ("RESOURCE_EXHAUSTED", "OOM", "memory", "HTTP 500")
            )
            record["lora_remat"] = {
                "status": "refuted" if low_mem else "error",
                "reason": (
                    "selective ViT remat saves the encoder dot outputs; at "
                    "2B/bs-4 they need 19.28 GB vs 15.75 GB free on v5e "
                    "(measured, BENCH_NOTES round 4) — flag wired for v5p"
                ),
                "bound": "needs >= 19.28 GB HBM; v5e has 15.75",
                "error": repr(e)[:120],
            }
        gc.collect()
        jax.clear_caches()
        try:
            tok_s, _ = bench_decode(on_tpu)
            record["decode_tokens_per_sec"] = round(tok_s, 2)
        except Exception as e:  # pragma: no cover
            record["decode_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()
        try:
            tok_s, _ = bench_decode(on_tpu, int4=True)
            record["decode_tokens_per_sec_int4"] = round(tok_s, 2)
        except Exception as e:  # pragma: no cover
            record["decode_int4_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()
        try:
            tok_s, _ = bench_decode(on_tpu, int4=True, kv_int8=True, batch=8)
            record["decode_bs8_tokens_per_sec_int4_kv8"] = round(tok_s, 2)
        except Exception as e:  # pragma: no cover
            record["decode_kv8_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()

        # ---- W8A8 quality gate at serving widths (round-5 task 2) ----
        try:
            srcc, delta = bench_w8a8_quality(on_tpu)
            record["w8a8_srcc"] = round(srcc, 5)
            record["w8a8_srcc_delta"] = round(delta, 5)
            record["w8a8_quality_gate"] = (
                "PASS" if (srcc >= 0.995 and delta <= 0.005) else "FAIL"
            )
        except Exception as e:  # pragma: no cover
            record["w8a8_quality_error"] = repr(e)[:200]
        gc.collect()
        jax.clear_caches()

    # host-side scaled decode rate (round-5 task 3; no TPU involved)
    try:
        fps = bench_host_decode()
        if fps is not None:
            record["host_decode_frames_per_sec"] = round(fps, 1)
    except Exception as e:  # pragma: no cover
        record["host_decode_error"] = repr(e)[:200]

    print(json.dumps(record))


if __name__ == "__main__":
    main()
