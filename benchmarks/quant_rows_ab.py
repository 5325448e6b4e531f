"""A/B the one-pass attention-out quantize feed (quant_fuse.quant_rows)
at model level, in ONE process so tunnel drift cancels.

Arms (AIGV_QUANT_ROWS): 'vit' (default wiring), '0' (two-pass XLA
quantize of the flash output), 'vit,llm' (also inside the decoder's
nn.scan — the round-4 poison zone for Pallas feeds).

Usage: python benchmarks/quant_rows_ab.py [pipeline] [vit]
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
    for arm in ("vit", "0", "vit,llm", "vit"):  # A/B/C/A bounds drift
        os.environ["AIGV_QUANT_ROWS"] = arm
        tag = {"vit": "vit", "0": "off", "vit,llm": "both"}[arm]
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
