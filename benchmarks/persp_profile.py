"""Component breakdown of the fused 4-perspective scoring path (W8A8).

Times, per bs=4 batch (chained-slope, anti-DCE reductions):
  vit     8-frame encode (extract_feature)
  motion  SlowFast branch (extract_motion)
  prefill shared-prefix LLM prefill w/ KV capture (no ViT, embeds faked)
  full    the whole score_perspectives
The residual full - (vit+motion+prefill) is the suffix pass + splice +
readout. Decides where the last ~3% toward protocol 5.0x lives.

Usage: python benchmarks/persp_profile.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main():
    on_tpu = bench._is_tpu()
    report = {}
    # reuse bench_pipeline's model construction at the headline config
    _, seq, svt, _, setup = bench.bench_pipeline(on_tpu, w8a8=True)
    cfg, model, params, ids, px, mask, b = setup
    report["single_video_ms"] = round(svt * 1e3, 2)

    p = 4
    suffix = 56 if on_tpu else 16
    prefix_len = int(ids.shape[1]) - suffix
    ids_p = jnp.tile(ids[:, None, :], (1, p, 1))
    tails = np.random.default_rng(1).integers(
        10, cfg.llm.vocab_size, (1, p, suffix)
    )
    ids_p = ids_p.at[:, :, prefix_len:].set(jnp.asarray(tails, jnp.int32))
    mask_p = jnp.tile(mask[:, None, :], (1, p, 1))

    t_frames = px.shape[1]
    frames = px.reshape((b * t_frames,) + px.shape[2:])

    @jax.jit
    def probe_vit(params, frames):
        e = model.apply(params, frames, method="extract_feature")
        return jnp.sum(e.astype(jnp.float32))

    @jax.jit
    def probe_motion(params, px):
        e = model.apply(params, px, method="extract_motion")
        return jnp.sum(e.astype(jnp.float32))

    @jax.jit
    def probe_full(params, ids_p, px, mask_p):
        s = model.apply(
            params, ids_p, px, mask_p, method="score_perspectives",
            shared_prefix_len=prefix_len,
        )
        return jnp.sum(s.astype(jnp.float32))

    iters = 8 if on_tpu else 2
    for name, fn, args in (
        ("vit_ms", probe_vit, (params, frames)),
        ("motion_ms", probe_motion, (params, px)),
        ("full_4p_ms", probe_full, (params, ids_p, px, mask_p)),
    ):
        per_iter, _ = bench._timeit(fn, args, iters)
        report[name] = round(per_iter * 1e3, 2)
        print(name, report[name], flush=True)

    report["residual_llm_ms"] = round(
        report["full_4p_ms"] - report["vit_ms"] - report["motion_ms"], 2
    )
    report["persp_per_sec"] = round(b * p / (report["full_4p_ms"] / 1e3), 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
