"""HTTP video-scoring service (online serving).

The reference has no serving entry at all (scoring runs as offline bs=1
eval loops, `stage2_eval.py:893-962`); `cli/score.py` is this framework's
batched OFFLINE path. This is the ONLINE path: a ThreadingHTTPServer in
front of a micro-batching device worker —

- requests park on a queue; the device thread collects up to
  `--batch_size` videos (or waits at most `--max_wait_ms`), pads the group
  to the one compiled batch shape, and runs the same fused
  multi-perspective scorer as the offline CLI (shared ViT/motion encode +
  shared-prefix LLM prefill per video, `AIGVAssessor.score_perspectives`);
- video decode (native ffmpeg / cv2 / GIF) + host resize run on the HTTP
  handler threads, so decode of incoming requests overlaps device compute
  of the current batch;
- frames travel host->device as UINT8 (4x fewer bytes than fp32 — the
  transfer link, not the chip, bounds online throughput) with the [0,1]
  scaling + mean/std normalization fused into the scoring program;
- the device loop is a one-deep pipeline: batch N's readback is deferred
  until batch N+1 has been dispatched, so transfer and compute overlap;
- one compiled program serves every request: no shape polymorphism, no
  recompiles after warmup.

Endpoints:
  GET  /healthz            -> {"status": "ok", model/batch info}
  POST /score              -> body = raw video bytes (mp4/gif/...; also
                              accepts JSON {"path": "/local/file"}), reply
                              {"scores": {question: mos_scaled_score, ...}}

Usage:
  python -m aigv_assessor_tpu.cli.serve --model_name_or_path ckpt/ \
      --port 8760 --batch_size 8 \
      --question "How would you rate the static quality of this video?"
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import queue
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from aigv_assessor_tpu.cli.args import _bool
from aigv_assessor_tpu.cli.score import build_prompt_ids
from aigv_assessor_tpu.data.video import load_video, transform_frames

logger = logging.getLogger(__name__)


@dataclass
class _Job:
    pixels: object  # [T, H, W, 3] jax.Array (device_put on the handler thread)
    done: threading.Event = field(default_factory=threading.Event)
    scores: Optional[np.ndarray] = None  # [P] on success
    error: Optional[str] = None


class _Stats:
    """Where does online time go? Accumulated by the device loop and the
    decode path, snapshot via /statz — the offline-vs-online gap must be
    attributable (batch underfill vs host decode vs device wait), not
    guessed at."""

    def __init__(self):
        self._lock = threading.Lock()
        self.batches = 0
        self.jobs = 0          # sum of real (non-pad) jobs over batches
        self.linger_s = 0.0    # device loop: waiting to fill after 1st job
        self.assemble_s = 0.0  # on-device stack + dispatch (h2d rides submit)
        self.flush_s = 0.0     # blocking device readback wait
        self.idle_s = 0.0      # q.get() timeouts with nothing pending
        self.decode_s = 0.0    # handler-thread video decode + resize
        self.decodes = 0

    def add(self, **kw) -> None:
        with self._lock:
            for k, v in kw.items():
                setattr(self, k, getattr(self, k) + v)

    def snapshot(self, batch_size: int) -> dict:
        with self._lock:
            b = max(self.batches, 1)
            return {
                "batches": self.batches,
                "jobs": self.jobs,
                "mean_batch_fill": round(self.jobs / b, 3),
                "batch_capacity": batch_size,
                "linger_s_per_batch": round(self.linger_s / b, 4),
                "assemble_s_per_batch": round(self.assemble_s / b, 4),
                "flush_s_per_batch": round(self.flush_s / b, 4),
                "idle_s_total": round(self.idle_s, 3),
                "decodes": self.decodes,
                "decode_s_mean": round(
                    self.decode_s / max(self.decodes, 1), 4
                ),
            }


class ScoringService:
    """Micro-batching wrapper around the fused perspective scorer: submit()
    blocks until the device thread has scored the caller's video inside a
    padded fixed-shape batch."""

    def __init__(
        self,
        questions: List[str],
        model_name_or_path: str = "",
        model_scale: str = "auto",
        batch_size: int = 8,
        num_segments: int = 8,
        max_wait_ms: float = 30.0,
        bf16: bool = True,
        int8: bool = False,
        int4: bool = False,
        w8a8: bool = False,
        mos_scale: float = 100.0,
        shared_prefix: bool = True,
        max_seq_length: int = 4096,
        device_preprocess: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from aigv_assessor_tpu.cli.common import (
            build_serving_stack,
            compute_shared_prefix_len,
        )

        config, model, params, tokenizer = build_serving_stack(
            model_name_or_path=model_name_or_path,
            model_scale=model_scale,
            max_seq_length=max_seq_length,
            bf16=bf16,
            int8=int8,
            int4=int4,
            w8a8=w8a8,
        )
        self.questions = questions
        self.batch_size = batch_size
        self.num_segments = num_segments
        self.max_wait = max_wait_ms / 1e3
        self.mos_scale = mos_scale
        self.image_size = config.force_image_size or config.vision.image_size
        self.device_preprocess = device_preprocess
        self._params = params

        prompts = [
            build_prompt_ids(
                tokenizer, config.template, q, num_segments,
                config.num_image_token,
            )
            for q in questions
        ]
        max_n = max(len(p) for p in prompts)
        ids = np.full((len(prompts), max_n), tokenizer.pad_token_id, np.int32)
        mask = np.zeros((len(prompts), max_n), bool)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            mask[i, : len(p)] = True
        prefix_len = 0
        if shared_prefix:
            prefix_len = compute_shared_prefix_len(
                prompts, config.img_context_token_id
            )
        self._ids = jnp.asarray(np.tile(ids[None], (batch_size, 1, 1)))
        self._mask = jnp.asarray(np.tile(mask[None], (batch_size, 1, 1)))

        compute_dtype = (
            jnp.float32 if not bf16 else jnp.bfloat16
        )

        @jax.jit
        def score_batch(params, input_ids, pixel_list, attention_mask):
            # per-job pixel arrays arrive as a TUPLE and are stacked inside
            # the compiled program: the loop's assemble step is then ONE
            # executable dispatch instead of a device-side concat dispatch
            # followed by the scoring dispatch (each dispatch is a tunnel
            # round-trip; round-5 attribution measured the two-dispatch form
            # at 43-69 ms/batch under load)
            pixel_values = jnp.stack(pixel_list)
            if pixel_values.dtype == jnp.uint8:
                from aigv_assessor_tpu.ops.preprocess import resize_normalize

                pixel_values = resize_normalize(
                    pixel_values, size=pixel_values.shape[-2],
                    dtype=compute_dtype,
                )
            return model.apply(
                params, input_ids, pixel_values, attention_mask,
                method="score_perspectives",
                shared_prefix_len=prefix_len or None,
            )

        self._score_batch = score_batch
        self._jnp = jnp
        self._device_put = jax.device_put
        self.stats = _Stats()
        self._q: "queue.Queue[_Job]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._device_loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ public ---

    def warmup(self) -> None:
        """Compile the scoring program before serving traffic."""
        px = np.zeros(
            (self.num_segments, self.image_size, self.image_size, 3),
            np.uint8 if self.device_preprocess else np.float32,
        )
        self.submit(px)

    def decode(self, path: str) -> np.ndarray:
        t0 = time.monotonic()
        try:
            return self._decode(path)
        finally:
            self.stats.add(decode_s=time.monotonic() - t0, decodes=1)

    def _decode(self, path: str) -> np.ndarray:
        s = self.image_size
        if (
            self.device_preprocess
            and "cogvideo" not in path
            and not path.lower().endswith(".gif")
            and not os.path.isdir(path)
        ):
            # fast path: the native ffmpeg decoder scales DURING decode
            # (libswscale bicubic, SIMD, GIL-free) — one pass straight to
            # [T, s, s, 3] uint8. Per-frame PIL bicubic on the handler
            # threads was 0.5 s/video on a 1-core serving host: the host,
            # not the chip, capped online throughput (BENCH_NOTES round 4).
            try:
                from aigv_assessor_tpu.data import native_decode

                if native_decode.available():
                    arrs = native_decode.sample_frames(
                        path, self.num_segments, out_size=(s, s)
                    )
                    return np.stack(arrs)
            except (ImportError, IOError):
                pass  # fall through to the PIL path
        frames = load_video(path, num_segments=self.num_segments)
        if self.device_preprocess:
            # handler threads decode + resize; frames stay UINT8 and the
            # normalization runs fused in the scoring program. fp32 frames
            # were the online bottleneck: 77 MB/batch took 1.3-1.9 s on the
            # host->device link vs 0.46 s of scoring (measured; uint8 is 4x
            # smaller). A per-request device-side resize is worse still —
            # its readback serializes behind in-flight score batches.
            from PIL import Image

            return np.stack([
                np.asarray(
                    f.resize((s, s), Image.BICUBIC)
                    if f.size != (s, s) else f,
                    np.uint8,
                )
                for f in frames
            ])
        return transform_frames(frames, input_size=self.image_size)

    def submit(self, pixels: np.ndarray) -> np.ndarray:
        """Blocks until scored; returns [P] float scores (mos-scaled)."""
        if self._stop.is_set():
            raise RuntimeError("service is closed")
        # h2d on the HANDLER thread: the async transfer enqueue overlaps
        # other handlers' decodes and the device loop's linger window, so
        # assemble on the loop's critical path is just an on-device stack +
        # dispatch (round-4 attribution: 124 ms/batch assemble at fill 2.67,
        # dominated by host np.stack + one large h2d inside the loop)
        job = _Job(pixels=self._device_put(pixels))
        self._q.put(job)
        if self._stop.is_set() and not job.done.is_set():
            # close() may have drained the queue between our check and the
            # put; if the job is still queued, fail it here rather than
            # park forever on done.wait()
            job.error = "service closed before the job was scored"
            job.done.set()
        job.done.wait()
        if job.error is not None:
            raise RuntimeError(job.error)
        return job.scores

    def close(self) -> None:
        self._stop.set()
        # the device loop exits without draining: fail queued jobs and any
        # un-flushed one-deep `pending` batch so no submit() caller is left
        # parked forever on job.done (in-flight handlers during shutdown).
        # Loop until the worker has actually exited — a single timed join
        # could return during a >5s cold compile and race the live loop.
        while True:
            self._thread.join(timeout=5)
            while True:
                try:
                    job = self._q.get_nowait()
                except queue.Empty:
                    break
                job.error = "service closed before the job was scored"
                job.done.set()
            if not self._thread.is_alive():
                break

    # ------------------------------------------------------------ device ---

    def _drain_on_stop(self, pending) -> None:
        """Complete the deferred batch (its compute already ran) and fail
        anything still queued when the loop is told to stop."""
        if pending is not None:
            try:
                self._flush(pending)
            except Exception as e:  # pragma: no cover - device error on exit
                for job in pending[0]:
                    if not job.done.is_set():
                        job.error = repr(e)
                        job.done.set()

    def _flush(self, p) -> None:
        jobs, dev = p
        t0 = time.monotonic()
        scores = np.asarray(dev)  # the only sync point
        self.stats.add(flush_s=time.monotonic() - t0)
        for i, job in enumerate(jobs):
            job.scores = scores[i] * self.mos_scale
            job.done.set()

    def _device_loop(self) -> None:
        jnp = self._jnp
        pending = None  # (jobs, scores_device): readback deferred one batch
        flush = self._flush

        while not self._stop.is_set():
            t_idle = time.monotonic()
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                if pending is not None:
                    flush(pending)
                    pending = None
                else:
                    self.stats.add(idle_s=time.monotonic() - t_idle)
                continue
            jobs = [first]
            # micro-batch: linger until the first job's deadline, taking
            # whatever arrives — staggered arrivals (decode finishes on
            # different handler threads) must still coalesce into one batch
            t_linger = time.monotonic()
            deadline = t_linger + self.max_wait
            while len(jobs) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    jobs.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            t_asm = time.monotonic()
            try:
                pixels = [j.pixels for j in jobs]
                pixels += [pixels[-1]] * (self.batch_size - len(pixels))
                # inputs were device_put on the handler threads; the batch
                # stack happens INSIDE the compiled program (tuple pytree
                # input), so this is a single dispatch
                dev = self._score_batch(
                    self._params, self._ids, tuple(pixels), self._mask
                )
                t_done = time.monotonic()
                self.stats.add(
                    batches=1, jobs=len(jobs),
                    linger_s=t_asm - t_linger, assemble_s=t_done - t_asm,
                )
                # one-deep pipeline: complete the PREVIOUS batch while this
                # one's transfer+compute are in flight
                if pending is not None:
                    flush(pending)
                pending = (jobs, dev)
            except Exception as e:  # pragma: no cover - surfaced to callers
                for job in jobs:
                    job.error = repr(e)
                    job.done.set()
        self._drain_on_stop(pending)


class _Server(ThreadingHTTPServer):
    # default listen backlog (5) resets connections under concurrent load
    request_queue_size = 128
    daemon_threads = True


def make_handler(service: ScoringService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route through logging, not stderr
            logger.debug("http: " + fmt, *a)

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "questions": service.questions,
                        "batch_size": service.batch_size,
                        "num_segments": service.num_segments,
                    },
                )
            elif self.path == "/statz":
                self._reply(200, service.stats.snapshot(service.batch_size))
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/score":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    req = json.loads(body)
                    pixels = service.decode(req["path"])
                else:
                    # raw video bytes: decode from a temp file (the readers
                    # key the decoder off the suffix; default mp4)
                    suffix = {
                        "image/gif": ".gif",
                        "video/webm": ".webm",
                    }.get(ctype, ".mp4")
                    with tempfile.NamedTemporaryFile(
                        suffix=suffix, delete=False
                    ) as f:
                        f.write(body)
                        tmp = f.name
                    try:
                        pixels = service.decode(tmp)
                    finally:
                        os.unlink(tmp)
                scores = service.submit(pixels)
                self._reply(
                    200,
                    {
                        "scores": {
                            q: float(s)
                            for q, s in zip(service.questions, scores)
                        }
                    },
                )
            except Exception as e:
                logger.exception("score request failed")
                self._reply(400, {"error": repr(e)[:300]})

    return Handler


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_name_or_path", default="")
    ap.add_argument("--model_scale", default="auto",
                    choices=["auto", "tiny", "2b", "8b"])
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8760)
    ap.add_argument("--question", action="append", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_segments", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=30.0)
    ap.add_argument("--bf16", type=_bool, default=True)
    ap.add_argument("--int8", type=_bool, default=False)
    ap.add_argument("--int4", type=_bool, default=False)
    ap.add_argument("--w8a8", type=_bool, default=False)
    ap.add_argument("--mos_scale", type=float, default=100.0)
    ap.add_argument("--max_seq_length", type=int, default=4096)
    ap.add_argument("--device_preprocess", type=_bool, default=True,
                    help="uint8 host decode+resize with the normalization "
                         "fused into the device scoring program — 4x less "
                         "host->device traffic (False = fp32 host "
                         "transform)")
    args = ap.parse_args(argv)

    service = ScoringService(
        questions=args.question
        or ["How would you rate the static quality of this video?"],
        model_name_or_path=args.model_name_or_path,
        model_scale=args.model_scale,
        batch_size=args.batch_size,
        num_segments=args.num_segments,
        max_wait_ms=args.max_wait_ms,
        bf16=args.bf16,
        int8=args.int8,
        int4=args.int4,
        w8a8=args.w8a8,
        mos_scale=args.mos_scale,
        max_seq_length=args.max_seq_length,
        device_preprocess=args.device_preprocess,
    )
    logger.info("compiling the scoring program...")
    service.warmup()
    server = _Server((args.host, args.port), make_handler(service))
    logger.info("serving on %s:%d", args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
