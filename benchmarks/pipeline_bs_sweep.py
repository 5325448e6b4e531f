"""Scoring-pipeline batch-size sweep: videos scored/sec/chip vs bs.

The flagship bench (bench.py) runs bs=4; this sweeps bs to find the
throughput knee on the 16 GB chip (larger batches raise MXU utilization
on the LLM prefill until activations OOM). Reuses bench.bench_pipeline
(same protocol: median of chained-loop repeats, RTT-subtracted).

Usage: python benchmarks/pipeline_bs_sweep.py [--bs 4 8 16]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[4, 8, 16])
    args = ap.parse_args()

    on_tpu = bench._is_tpu()
    for b in args.bs:
        try:
            vps, seq, per_video, samples, setup = bench.bench_pipeline(
                on_tpu, batch=b
            )
            del setup
            print(
                json.dumps(
                    {
                        "bs": b,
                        "videos_per_sec": round(vps, 3),
                        "ms_per_video": round(per_video * 1e3, 1),
                        "spread_s": [
                            round(min(samples), 4), round(max(samples), 4)
                        ],
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(json.dumps({"bs": b, "error": repr(e)[:160]}), flush=True)
        gc.collect()
        import jax

        jax.clear_caches()


if __name__ == "__main__":
    main()
