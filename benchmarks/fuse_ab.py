"""A/B the fused producer+quantize feeds (ops/quant_fuse) at model level.

Runs bench.bench_pipeline(w8a8=True) / bench.bench_vit(w8a8=True) twice in
ONE process — AIGV_FUSE_QUANT=1 then 0 — so the tunnel's run-to-run
throughput spread (BENCH_NOTES 'measurement traps') cancels. bench_pipeline
rebuilds the model and jits fresh each call, so the env toggle takes effect
at trace time.

Usage: python benchmarks/fuse_ab.py [pipeline] [vit]
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
    want = set(sys.argv[1:]) or {"pipeline", "vit"}
    on_tpu = bench._is_tpu()
    out = {}
    for fused in ("1", "0", "1"):  # A/B/A to bound drift
        os.environ["AIGV_FUSE_QUANT"] = {"1": "vit,llm", "0": "0"}[fused]
        tag = f"fused{fused}"
        if "pipeline" in want:
            vps, _, svt, samples, setup = bench.bench_pipeline(on_tpu, w8a8=True)
            out.setdefault(f"pipeline_vps_{tag}", []).append(round(vps, 3))
            try:
                pp, sp, _ = bench.bench_perspectives(on_tpu, setup, svt)
                out.setdefault(f"persp_ps_{tag}", []).append(round(pp, 3))
            except Exception as e:  # pragma: no cover
                out[f"persp_err_{tag}"] = repr(e)[:200]
            del setup
            gc.collect()
            jax.clear_caches()
        if "vit" in want:
            fps = bench.bench_vit(on_tpu, w8a8=True)
            out.setdefault(f"vit_fps_{tag}", []).append(round(fps, 2))
            gc.collect()
            jax.clear_caches()
        print(json.dumps({k: v for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
