"""Print the auditable MFU/roofline table for the bench config (VERDICT r2
item 6): per-component FLOPs/step, minimum HBM bytes/step, time bounds at v5e
peaks, vs the measured step decomposition (benchmarks/step_ablation.py).

Pure arithmetic — runs anywhere: ``python benchmarks/mfu_accounting.py
[--ms-per-step 9.0]``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from transformers4rec_tpu.utils.flops import (  # noqa: E402
    V5E_HBM_BYTES_PER_S,
    V5E_PEAK_BF16_FLOPS,
    V5E_PEAK_F32_FLOPS,
    mfu,
    xlnet_mlm_step_accounting,
)

# measured per-step decomposition on TPU v5e (benchmarks/step_ablation.py,
# 2 reps/arm, K=8 packing; docs/performance.md)
MEASURED_MS = {
    "CE kernels (fwd+bwd)": 4.0,
    "table optimizer (adafactor)": 2.0,
    "encoder fwd+bwd (3 layers)": 2.0,
    "masking/lookups/misc": 2.9,
    "dispatch floor": 0.8,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms-per-step", type=float, default=9.0,
                    help="measured ms/step (bench.py reports ms_per_step)")
    args = ap.parse_args()

    acct = xlnet_mlm_step_accounting()
    step_s = args.ms_per_step / 1e3

    def ms_at(flops, peak):
        return flops / peak * 1e3

    print("REES46 XLNet-MLM bench config: B=128 S=20 D=192 L=3 H=16 "
          f"V=390008 E=64, adaptive CE budget -> {acct['ce_rows']} rows")
    print()
    print(f"{'component':36s} {'FLOPs/step':>14s} {'bf16-bound':>11s} "
          f"{'f32-bound':>10s} {'HBM bytes':>11s} {'HBM-bound':>10s}")
    rows = [
        ("encoder fwd+bwd (GEMMs)", acct["encoder_flops"], None),
        ("tying projection 192->64", acct["projection_flops"], None),
        ("CE softmax fwd+bwd (GEMMs)", acct["ce_flops"], acct["ce_hbm_bytes"]),
        ("table optimizer (elementwise)", 0, acct["optimizer_hbm_bytes"]),
    ]
    for name, flops, nbytes in rows:
        b_ms = f"{ms_at(flops, V5E_PEAK_BF16_FLOPS):.3f}ms" if flops else "-"
        f_ms = f"{ms_at(flops, V5E_PEAK_F32_FLOPS):.3f}ms" if flops else "-"
        if nbytes:
            h = f"{nbytes / 1e6:.0f}MB"
            h_ms = f"{nbytes / V5E_HBM_BYTES_PER_S * 1e3:.3f}ms"
        else:
            h, h_ms = "-", "-"
        print(f"{name:36s} {flops / 1e9:>12.2f}G {b_ms:>11s} {f_ms:>10s} "
              f"{h:>11s} {h_ms:>10s}")
    print(f"{'TOTAL model FLOPs':36s} {acct['total_flops'] / 1e9:>12.2f}G")
    print()
    print(f"CE VPU elementwise ops (exp & co): {acct['ce_vpu_ops'] / 1e9:.2f}G "
          "ops/step — the measured binding resource for the CE kernels")
    print()
    print(f"measured step: {args.ms_per_step:.2f} ms  ->  "
          f"model {acct['total_flops'] / step_s / 1e12:.2f} TFLOP/s,  "
          f"MFU {mfu(acct['total_flops'], step_s) * 100:.1f}% of bf16 peak, "
          f"{mfu(acct['total_flops'], step_s, V5E_PEAK_F32_FLOPS) * 100:.1f}% "
          "of f32 peak")
    print()
    print("measured decomposition (step_ablation.py):")
    for k, v in MEASURED_MS.items():
        print(f"  {k:32s} {v:5.1f} ms")
    print("""
reading: the step is FLOP-sparse BY DESIGN — the adaptive CE budget cuts the
(N, V) work ~2.8x and the CE kernels sit at the exp/VPU throughput floor for
their size (op probes: GEMM+rowsum 4.49ms vs +exp 4.50ms at N=1792), not the
MXU or HBM bound. The optimizer is ~3.3x off the HBM minimum (scatter-add +
moment math). Remaining headroom is N (sampled softmax, quality-negative at
this V) and optimizer traffic — both measured and documented.""")


if __name__ == "__main__":
    main()
