"""Fused 4-perspective scoring: batch sweep under W8A8.

Round-3 found the plain pipeline saturated at bs=4 and OOM at bs=8 — in
bf16. W8A8 halves the tower weights (~2.4 GB freed), so larger batches
may now fit and amortize the per-batch fixed costs (motion branch, scan
dispatch, suffix pass). One process, increasing order, so drift is
visible within the run.

Usage: python benchmarks/persp_sweep.py [batches...]  (default 4 6 8)
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
    batches = [int(a) for a in sys.argv[1:]] or [4, 6, 8]
    on_tpu = bench._is_tpu()
    out = {}
    for b in batches:
        try:
            vps, _, svt, _, setup = bench.bench_pipeline(
                on_tpu, batch=b, w8a8=True
            )
            out[f"pipeline_vps_bs{b}"] = round(vps, 3)
            pp, sp, _ = bench.bench_perspectives(on_tpu, setup, svt)
            out[f"persp_ps_bs{b}"] = round(pp, 3)
            out[f"protocol_bs{b}"] = round(
                (pp / 4.0) / (bench.A100_REF_VIDEOS_PER_SEC / 4.0), 3
            )
            del setup
        except Exception as e:  # pragma: no cover
            out[f"err_bs{b}"] = repr(e)[:160]
        gc.collect()
        jax.clear_caches()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
