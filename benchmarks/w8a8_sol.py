"""Component-wise W8A8 speed-of-light table for the scoring pipeline.

Round-5 verdict task 4: derive the int8 SOL for the current mixed
pipeline (int8 dots, bf16 attention kernels + out-of-scan epilogues,
two-pass XLA quantize feeds in the decoder) and locate the measured
throughput against it.

Everything here is ARITHMETIC over (a) FLOP counts computed from the
real 2B/ViT-300M configs at the bs=4 fused-4-perspective operating
point, and (b) kernel rates MEASURED on this chip in rounds 2-5
(provenance in comments). No new device time is needed; run it anywhere.

Usage: python benchmarks/w8a8_sol.py
"""

from __future__ import annotations

# ---- measured rates (v5e via axon tunnel; BENCH_NOTES.md) ----
INT8_CHAINED_TOPS = 234.4e12  # scan-chained MLP blocks w/ quantize feeds (r4 w8a8_scan_probe)
INT8_SINGLE_TOPS = 343e12  # isolated 2-D dot+epilogue, llm_wqkv shape (r4 int8_xla_probe)
BF16_TFLOPS = 195e12  # measured dense bf16 (96-100% of 197 peak)
VIT_ATTN_MS_B64 = 4.81  # r3 vit_kernel_sweep, [64,48,1032,64] fused-qkv flash
LLM_ATTN_MS_B4 = 1.52  # r2, causal GQA [4,16q/8kv,2113,128]
QUANT_GBPS = 500e9  # two-pass XLA quantize streams ~476-525 GB/s (r4/r5 probes)
MOTION_MS = 18.2  # measured slice, r5 persp_profile
MEASURED = {"vit": 169.0, "llm": 165.0, "motion": 18.2, "full": 352.2}
PERSP_PER_SEC = 45.42


def dots_ms(ops, rate):
    return ops / rate * 1e3


def main():
    # ---- operating point: bs=4 videos, 8 frames, 4 perspectives fused ----
    frames = 32  # 4 videos x 8 frames
    vit_tokens = 1032  # 1025 padded to sublane multiple
    R_vit = frames * vit_tokens

    # ViT-300M: 24 layers, h=1024, mlp 4096, 16 heads x 64
    h, m, L = 1024, 4096, 24
    vit_dot_ops = L * (
        2 * R_vit * h * 3 * h  # qkv
        + 2 * R_vit * h * h  # proj
        + 2 * R_vit * h * m  # fc1
        + 2 * R_vit * m * h  # fc2
    )
    vit_attn_ms = VIT_ATTN_MS_B64 * (frames / 64) * L
    # quantize feeds per layer: ln1->qkv (fused, 0.18 ms at R_vit), attn
    # out->proj (two-pass), ln2->fc1 (fused), gelu->fc2 (fused ~0.92).
    # bytes: fused feeds ~ 1 read bf16 + int8 write; two-pass ~ 2 reads + write
    def q_ms(rows, cols, passes):
        return (rows * cols * (2 * passes + 1)) / QUANT_GBPS * 1e3

    vit_quant_ms = L * (
        q_ms(R_vit, h, 1)  # ln1+quant fused
        + q_ms(R_vit, h, 2)  # attn-out quantize (XLA two-pass)
        + q_ms(R_vit, h, 1)  # ln2+quant fused
        + q_ms(R_vit, m, 1)  # gelu+quant fused
    )

    # LLM 2B: 24 layers, h=2048, inter 8192, 16q/8kv x 128
    S = 2120  # padded prefill rows per video (2057 shared + suffix later)
    R_llm = 4 * S
    hl, il, Ll = 2048, 8192, 24
    llm_dot_ops = Ll * (
        2 * R_llm * hl * 2 * hl  # wqkv (16q+2*8kv)*128 = 4096 out
        + 2 * R_llm * hl * hl  # wo
        + 2 * R_llm * hl * 2 * il  # w1+w3
        + 2 * R_llm * il * hl  # w2
    )
    # suffix pass (4 perspectives x ~56 tokens vs the captured cache):
    # ~224/2120 = 10.6% more rows through the dense path
    suffix_scale = 1.0 + 224.0 / S
    llm_dot_ops *= suffix_scale
    llm_attn_ms = LLM_ATTN_MS_B4 * Ll * suffix_scale
    llm_quant_ms = Ll * suffix_scale * (
        q_ms(R_llm, hl, 2)  # rms->wqkv (two-pass: LLM fused feeds OFF)
        + q_ms(R_llm, hl, 2)  # attn-out->wo
        + q_ms(R_llm, hl, 2)  # rms->w13
        + q_ms(R_llm, il, 2)  # silu-mul->w2 (reads h1,h3: ~3 passes worth)
    )

    rows = []
    # NB: the chained 234-TOPS rate already has the quantize passes
    # interleaved (the scan probe measured dot+quantize blocks), so the
    # quantize terms are only added on the single-dot basis; the chained
    # row is dots-at-chained-rate + attention only.
    for tag, rate, add_q in (
        ("chained-rate dots + attention", INT8_CHAINED_TOPS, False),
        ("SOL: ideal dots + attn + quantize", INT8_SINGLE_TOPS, True),
    ):
        vit = dots_ms(vit_dot_ops, rate) + vit_attn_ms + (vit_quant_ms if add_q else 0)
        llm = dots_ms(llm_dot_ops, rate) + llm_attn_ms + (llm_quant_ms if add_q else 0)
        full = vit + llm + MOTION_MS
        rows.append((tag, vit, llm, full))

    print(f"{'int8 rate basis':38s} {'ViT ms':>8s} {'LLM ms':>8s} {'full ms':>8s} {'persp/s':>8s} {'meas/SOL':>9s}")
    for tag, vit, llm, full in rows:
        print(f"{tag:38s} {vit:8.1f} {llm:8.1f} {full:8.1f} {16e3/full:8.1f} {full/MEASURED['full']:8.1%}")
    print(f"{'MEASURED (r5 persp_profile)':38s} {MEASURED['vit']:8.1f} {MEASURED['llm']:8.1f} "
          f"{MEASURED['full']:8.1f} {PERSP_PER_SEC:8.1f}")
    print()
    print(f"vit dots {vit_dot_ops/1e12:.2f} Top, llm dots {llm_dot_ops/1e12:.2f} Top, "
          f"vit attn {vit_attn_ms:.1f} ms, llm attn {llm_attn_ms:.1f} ms, "
          f"vit quant {vit_quant_ms:.1f} ms, llm quant {llm_quant_ms:.1f} ms, "
          f"motion {MOTION_MS:.1f} ms")


if __name__ == "__main__":
    main()
