"""Focused re-run of selected bench.py sections (round-4 iteration loop).

Usage: python benchmarks/r4_sections.py [pipeline_w8a8] [vit] [lora] ...
Sections: pipeline_w8a8, vit, vit_w8a8, lora, lora_selective, pipeline
"""

from __future__ import annotations

import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    want = set(sys.argv[1:]) or {"pipeline_w8a8", "vit_w8a8"}
    on_tpu = bench._is_tpu()
    out = {}

    def emit(**kw):
        # print incrementally: a later section OOMing must not lose the
        # minutes of results already measured
        out.update(kw)
        print(json.dumps(kw), flush=True)

    if "pipeline" in want:
        vps, seq, svt, samples, setup = bench.bench_pipeline(on_tpu)
        emit(videos_scored_per_sec=round(vps, 3))
        if "persp" in want:
            pp, sp, _ = bench.bench_perspectives(on_tpu, setup, svt)
            emit(perspectives_per_sec=round(pp, 3))
        del setup
        gc.collect(); jax.clear_caches()
    if "pipeline_w8a8" in want:
        vps, seq, svt, samples, setup = bench.bench_pipeline(on_tpu, w8a8=True)
        emit(
            videos_scored_per_sec_w8a8=round(vps, 3),
            spread_w8a8=[round(min(samples), 4), round(max(samples), 4)],
        )
        pp, sp, _ = bench.bench_perspectives(on_tpu, setup, svt)
        emit(
            perspectives_per_sec_w8a8=round(pp, 3),
            protocol_speedup=round((pp / 4.0) / (9.36 / 4.0), 3),
        )
        del setup
        gc.collect(); jax.clear_caches()
    if "vit" in want:
        emit(vit_fps_bf16=round(bench.bench_vit(on_tpu), 2))
        gc.collect(); jax.clear_caches()
    if "vit_w8a8" in want:
        emit(vit_fps_w8a8=round(bench.bench_vit(on_tpu, w8a8=True), 2))
        gc.collect(); jax.clear_caches()
    if "lora" in want:
        t, _ = bench.bench_train_step(on_tpu, stage=2)
        emit(lora_samples_per_sec=round(t, 3))
        gc.collect(); jax.clear_caches()
    if "lora_selective" in want:
        t, _ = bench.bench_train_step(
            on_tpu, stage=2,
            vit_remat_policy="dots_with_no_batch_dims_saveable",
        )
        emit(lora_samples_per_sec_selective=round(t, 3))
        gc.collect(); jax.clear_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
