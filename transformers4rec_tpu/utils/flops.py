"""Analytic FLOPs / HBM-bytes accounting for the training step (roofline).

No reference analog (the reference publishes throughput only). Used by
bench.py to report an ``mfu`` field and by benchmarks/mfu_accounting.py to
print the auditable per-component table in docs/performance.md — so a reader
can check the measured ex/s/chip against hardware bounds without trusting
prose.

Conventions:
- a GEMM of (m, k) x (k, n) counts 2*m*k*n FLOPs;
- backward of a GEMM = two GEMMs (dX, dW) → 3x the forward GEMM FLOPs for
  fwd+bwd through a dense layer;
- elementwise/VPU work (softmax exp, LayerNorm, optimizer math) is counted
  in ops separately — it rides the VPU, not the MXU, and never dominates the
  FLOP total but can dominate TIME (the CE kernels are exp-throughput-bound);
- bytes are the MINIMUM HBM traffic of the streamed implementation
  (weights/tables read once per pass; activations assumed resident in VMEM
  at these sizes).

TPU v5e peaks (public spec): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32
(bf16x3-pass), 819 GB/s HBM, 16 GB HBM.
"""

from __future__ import annotations

from typing import Dict, Optional

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 49.2e12
V5E_HBM_BYTES_PER_S = 819e9


def encoder_step_flops(
    batch: int,
    seq: int,
    d_model: int,
    n_layer: int,
    n_head: int,
    d_ff: Optional[int] = None,
    fwd_bwd: bool = True,
) -> int:
    """Transformer encoder GEMM FLOPs for one step (fwd, or fwd+bwd = 3x)."""
    d_ff = d_ff or 4 * d_model
    tokens = batch * seq
    qkvo = 4 * 2 * tokens * d_model * d_model
    # scores (B,H,S,S) and context: 2 GEMMs of (S, Dh) x (Dh, S) per head
    attn = 2 * 2 * batch * n_head * seq * seq * (d_model // n_head)
    ffn = 2 * 2 * tokens * d_model * d_ff
    per_layer = qkvo + attn + ffn
    total = n_layer * per_layer
    return total * (3 if fwd_bwd else 1)


def ce_step_flops(ce_rows: int, emb_dim: int, vocab: int,
                  fwd_bwd: bool = True) -> int:
    """Streamed full-softmax CE over the item vocab: one (M, E) x (E, V)
    GEMM forward; backward adds dX (M,V)x(V,E) and dW (E,M)x(M,V)."""
    gemm = 2 * ce_rows * emb_dim * vocab
    return gemm * (3 if fwd_bwd else 1)


def ce_step_vpu_ops(ce_rows: int, vocab: int) -> int:
    """Transcendental/elementwise ops on the (M, V) logits stream: exp +
    running-max/sum bookkeeping forward, P - y residual backward. ~6 VPU
    ops per logit is the measured-calibrated coefficient."""
    return 6 * ce_rows * vocab * 2  # fwd + bwd passes


def ce_step_hbm_bytes(ce_rows: int, emb_dim: int, vocab: int,
                      dtype_bytes: int = 4) -> int:
    """Minimum table traffic of the V-major streamed CE: W read once forward,
    once for dX, once for dW accumulation (+ dW write)."""
    table = vocab * emb_dim * dtype_bytes
    return 4 * table


def table_optimizer_hbm_bytes(vocab: int, emb_dim: int,
                              dtype_bytes: int = 4) -> int:
    """Unfactored adafactor on the (V, E) table: read W, v, g; write W, v."""
    return 5 * vocab * emb_dim * dtype_bytes


def projection_step_flops(batch: int, seq: int, d_model: int, emb_dim: int,
                          fwd_bwd: bool = True) -> int:
    """Weight-tying projection d_model -> emb_dim."""
    gemm = 2 * batch * seq * d_model * emb_dim
    return gemm * (3 if fwd_bwd else 1)


def mlm_budget_rows(batch: int, seq: int, p: float) -> int:
    """The >=6-sigma adaptive CE-row budget (prediction_task._budget_rows)."""
    import math

    n = batch * seq
    m = int(n * p + 6.0 * math.sqrt(n * p * (1.0 - p))) + 8
    return min(m, n)


def xlnet_mlm_step_accounting(
    batch: int = 128,
    seq: int = 20,
    d_model: int = 192,
    n_layer: int = 3,
    n_head: int = 16,
    vocab: int = 390_008,
    emb_dim: int = 64,
    mlm_p: float = 0.3,
) -> Dict[str, float]:
    """Per-step accounting for the bench config (REES46 XLNet-MLM)."""
    m = mlm_budget_rows(batch, seq, mlm_p)
    enc = encoder_step_flops(batch, seq, d_model, n_layer, n_head)
    proj = projection_step_flops(batch, seq, d_model, emb_dim)
    ce = ce_step_flops(m, emb_dim, vocab)
    return {
        "ce_rows": m,
        "encoder_flops": enc,
        "projection_flops": proj,
        "ce_flops": ce,
        "total_flops": enc + proj + ce,
        "ce_vpu_ops": ce_step_vpu_ops(m, vocab),
        "ce_hbm_bytes": ce_step_hbm_bytes(m, emb_dim, vocab),
        "optimizer_hbm_bytes": table_optimizer_hbm_bytes(vocab, emb_dim),
    }


def mfu(total_flops_per_step: float, step_seconds: float,
        peak: float = V5E_PEAK_BF16_FLOPS) -> float:
    """Model FLOPs utilization: achieved model FLOP/s over the chip peak."""
    return total_flops_per_step / max(step_seconds, 1e-12) / peak
