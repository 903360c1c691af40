"""Fused (flash-style) attention Pallas kernel.

TPU-native replacement for the reference's HF attention implementations
(SURVEY.md §2.9: block/transformer.py:195 delegates to HF kernels), covering
the same masking variants the unified encoder composes: causal, key padding,
PLM perm-mask / local-window / relative-position additive biases.

Design (what makes it faster than materialized attention):
- online-softmax over K tiles: the (S, S) probability matrix never reaches HBM;
- ``causal`` is computed INLINE from iota (no O(S²) mask reads) and fully
  future tiles skip their compute;
- key padding is a (B, S) additive vector, not an (B, 1, S, S) tensor;
- an optional additive ``bias`` (perm/local/relative) is loaded tile-by-tile
  at its natural broadcast shape (1|B, 1|H, S, S) — never broadcast in HBM.

The backward pass is a SINGLE-PASS fused Pallas kernel (one logits recompute
→ dq/dk/dv, dq accumulated in a full-Sq VMEM scratch under an 8MB cap) and is
the live path whenever the forward kernel engages (``FUSED_BWD_MIN_SEQ = 0``:
measured 2.20 vs 2.24 ms at S=1024 and 23.0 vs 351.9 ms at S=8192 against the
older split dq/dkv pair, which remains only as the >cap fallback). Exception:
``bias_grad=True`` (a LEARNED bias, e.g. relative-position tables) reroutes
the whole backward through an XLA-remat vjp — the fused kernels cannot emit a
bias cotangent, and silently zeroing it would freeze the bias parameters.
Numerics are validated against jax.vjp of ``reference_attention`` in tests.

Dispatch policy: sessions in this domain are short (S≈20 — SURVEY.md §5), where
XLA's fused attention is already optimal; the kernel engages at S ≥ 128.

Precision note: matmuls run at the MXU's default (bfloat16 multiply,
f32 accumulate) — same as XLA's DEFAULT dot precision; outputs agree with the
jnp reference to ~1e-3 (bf16 noise), gradients exactly (rematerialized).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def reference_attention(q, k, v, bias=None, pad_mask=None, causal=False):
    """Pure-jnp reference (must match blocks/transformer.py MultiHeadAttention:
    softmax(q·kᵀ·scale + composed bias)·v with fully-masked-row zeroing)."""
    B, S, H, Dh = q.shape
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (Dh ** -0.5)
    total_bias = jnp.zeros((1, 1, S, S), jnp.float32)
    if bias is not None:
        total_bias = total_bias + bias.astype(jnp.float32)
    if causal:
        idx = jnp.arange(S)
        total_bias = total_bias + jnp.where(idx[None, :] > idx[:, None], NEG, 0.0)[None, None]
    if pad_mask is not None:
        total_bias = total_bias + jnp.where(pad_mask[:, None, None, :], 0.0, NEG)
    logits = logits + total_bias
    probs = jax.nn.softmax(logits, axis=-1)
    row_ok = (total_bias > NEG / 2).any(axis=-1, keepdims=True)
    probs = probs * row_ok.astype(probs.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(q.dtype)


def _tile_logits(q, k, qi, ki, block_q, block_k, seq_len, causal,
                 pad_ref, bias_ref):
    """Recompute one (BQ, BK) scaled+masked logits tile — shared by the
    forward and both backward kernels so masking semantics stay identical."""
    Dh = q.shape[-1]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (Dh ** -0.5)
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(col > row, NEG, logits)
    if seq_len % block_k:
        logits = jnp.where(col >= seq_len, 2.0 * NEG, logits)
    if pad_ref is not None:
        logits = logits + pad_ref[0]
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    return logits


def _make_kernel(causal: bool, has_pad: bool, has_bias: bool, H: int,
                 block_q: int, block_k: int, seq_len: int):
    def kernel(*refs):
        i = 0
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        pad_ref = refs[i] if has_pad else None
        i += 1 if has_pad else 0
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        o_ref = refs[i]; lse_ref = refs[i + 1]
        m_sc = refs[i + 2]; s_sc = refs[i + 3]; acc_sc = refs[i + 4]

        qi = pl.program_id(1)
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _():
            m_sc[:] = jnp.full_like(m_sc, 2.0 * NEG)
            s_sc[:] = jnp.zeros_like(s_sc)
            acc_sc[:] = jnp.zeros_like(acc_sc)

        # causal: a K tile strictly in the future of the whole Q tile is dead
        run = True
        if causal:
            run = ki * block_k <= qi * block_q + (block_q - 1)

        @pl.when(run)
        def _():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            logits = _tile_logits(q, k, qi, ki, block_q, block_k, seq_len,
                                  causal, pad_ref, bias_ref)

            m_prev = m_sc[:, 0]
            m_new = jnp.maximum(m_prev, logits.max(axis=1))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new[:, None])
            s_sc[:, 0] = s_sc[:, 0] * corr + p.sum(axis=1)
            m_sc[:, 0] = m_new
            acc_sc[:, :] = acc_sc[:, :] * corr[:, None] + jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(ki == nk - 1)
        def _():
            # fully-masked rows (max never rose above NEG/2) → zero output
            row_ok = m_sc[:, 0] > NEG / 2
            denom = jnp.where(s_sc[:, 0] > 0.0, s_sc[:, 0], 1.0)
            o_ref[0, :, :] = jnp.where(
                row_ok[:, None], acc_sc[:, :] / denom[:, None], 0.0
            ).astype(o_ref.dtype)
            # saved for the fused backward; masked rows get a +sentinel so
            # exp(logits - lse) = exp(NEG - 2|NEG|) underflows to 0
            lse_ref[0, :, 0] = jnp.where(
                row_ok, m_sc[:, 0] + jnp.log(denom), -2.0 * NEG
            )

    return kernel


def _make_bwd_dq_kernel(causal: bool, has_pad: bool, has_bias: bool, H: int,
                        block_q: int, block_k: int, seq_len: int):
    """Grid (B*H, nQ, nK), K minor: dq tile accumulated in scratch.
    ds = p * (dp - delta);  dq += scale * ds @ K."""

    def kernel(*refs):
        i = 0
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        do_ref = refs[i]; i += 1
        lse_ref = refs[i]; i += 1
        delta_ref = refs[i]; i += 1
        pad_ref = refs[i] if has_pad else None
        i += 1 if has_pad else 0
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        dq_ref = refs[i]; acc_sc = refs[i + 1]

        qi = pl.program_id(1)
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _():
            acc_sc[:] = jnp.zeros_like(acc_sc)

        run = True
        if causal:
            run = ki * block_k <= qi * block_q + (block_q - 1)

        @pl.when(run)
        def _():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            logits = _tile_logits(q, k, qi, ki, block_q, block_k, seq_len,
                                  causal, pad_ref, bias_ref)
            p = jnp.exp(logits - lse_ref[0])  # 0 on fully-masked rows
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta_ref[0])
            Dh = q.shape[-1]
            acc_sc[:, :] += jax.lax.dot_general(
                ds.astype(k.dtype), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (Dh ** -0.5)

        @pl.when(ki == nk - 1)
        def _():
            dq_ref[0, :, :] = acc_sc[:, :].astype(dq_ref.dtype)

    return kernel


def _make_bwd_dkv_kernel(causal: bool, has_pad: bool, has_bias: bool, H: int,
                         block_q: int, block_k: int, seq_len: int):
    """Grid (B*H, nK, nQ), Q minor: dk/dv tiles accumulated in scratch.
    dv += pᵀ @ dO;  dk += scale * dsᵀ @ Q."""

    def kernel(*refs):
        i = 0
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        do_ref = refs[i]; i += 1
        lse_ref = refs[i]; i += 1
        delta_ref = refs[i]; i += 1
        pad_ref = refs[i] if has_pad else None
        i += 1 if has_pad else 0
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        dk_ref = refs[i]; dv_ref = refs[i + 1]
        dk_sc = refs[i + 2]; dv_sc = refs[i + 3]

        ki = pl.program_id(1)
        qi = pl.program_id(2)
        nq = pl.num_programs(2)

        @pl.when(qi == 0)
        def _():
            dk_sc[:] = jnp.zeros_like(dk_sc)
            dv_sc[:] = jnp.zeros_like(dv_sc)

        run = True
        if causal:
            run = ki * block_k <= qi * block_q + (block_q - 1)

        @pl.when(run)
        def _():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            logits = _tile_logits(q, k, qi, ki, block_q, block_k, seq_len,
                                  causal, pad_ref, bias_ref)
            p = jnp.exp(logits - lse_ref[0])
            dv_sc[:, :] += jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta_ref[0])
            Dh = q.shape[-1]
            dk_sc[:, :] += jax.lax.dot_general(
                ds.astype(q.dtype), q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (Dh ** -0.5)

        @pl.when(qi == nq - 1)
        def _():
            dk_ref[0, :, :] = dk_sc[:, :].astype(dk_ref.dtype)
            dv_ref[0, :, :] = dv_sc[:, :].astype(dv_ref.dtype)

    return kernel


def _make_bwd_fused_kernel(causal: bool, has_pad: bool, has_bias: bool, H: int,
                           block_q: int, block_k: int, seq_len: int):
    """Single-pass fused backward: grid (B*H, nK, nQ). ONE logits
    recomputation feeds all three gradients — dk/dv tiles accumulate in
    per-K-tile scratch (Q minor), dq accumulates in a full-Sq VMEM scratch
    sliced per Q block (the CE-dx-scratch pattern). 5 S²-GEMMs per tile vs 7
    for the split dq/dkv kernels (logits+dp recomputed twice there)."""

    def kernel(*refs):
        i = 0
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        do_ref = refs[i]; i += 1
        lse_ref = refs[i]; i += 1
        delta_ref = refs[i]; i += 1
        pad_ref = refs[i] if has_pad else None
        i += 1 if has_pad else 0
        bias_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        dq_ref = refs[i]; dk_ref = refs[i + 1]; dv_ref = refs[i + 2]
        dk_sc = refs[i + 3]; dv_sc = refs[i + 4]; dq_sc = refs[i + 5]

        ki = pl.program_id(1)
        qi = pl.program_id(2)
        nk = pl.num_programs(1)
        nq = pl.num_programs(2)
        Dh = q_ref.shape[-1]
        sl = pl.ds(qi * block_q, block_q)

        @pl.when(qi == 0)
        def _():
            dk_sc[:] = jnp.zeros_like(dk_sc)
            dv_sc[:] = jnp.zeros_like(dv_sc)

        @pl.when(ki == 0)
        def _():
            dq_sc[sl, :] = jnp.zeros((block_q, Dh), jnp.float32)

        run = True
        if causal:
            run = ki * block_k <= qi * block_q + (block_q - 1)

        @pl.when(run)
        def _():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            logits = _tile_logits(q, k, qi, ki, block_q, block_k, seq_len,
                                  causal, pad_ref, bias_ref)
            p = jnp.exp(logits - lse_ref[0])  # 0 on fully-masked rows
            dv_sc[:, :] += jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta_ref[0])).astype(q.dtype)
            scale = Dh ** -0.5
            dk_sc[:, :] += jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dq_sc[sl, :] += jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

        @pl.when(qi == nq - 1)
        def _():
            dk_ref[0, :, :] = dk_sc[:, :].astype(dk_ref.dtype)
            dv_ref[0, :, :] = dv_sc[:, :].astype(dv_ref.dtype)

        @pl.when(ki == nk - 1)
        def _():
            dq_ref[0, :, :] = dq_sc[sl, :].astype(dq_ref.dtype)

    return kernel


def _prep(q, k, v, bias, pad_mask, block_q, block_k):
    """Shared fwd/bwd input prep: pad to tile multiples, flatten heads, and
    build the pad/bias block specs (broadcast-aware, never materialized)."""
    B, S, H, Dh = q.shape
    # clamp blocks to the 128-rounded sequence so short sequences don't pad
    # up to a full oversized tile (block sweep on v5e: 512/1024 optimal at
    # S=2048, 1.7x over XLA's fused attention)
    s128 = ((S + 127) // 128) * 128
    block_q = min(block_q, s128)
    block_k = min(block_k, s128)
    Sq = ((S + block_q - 1) // block_q) * block_q
    Sk = ((S + block_k - 1) // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, Sq - S), (0, 0), (0, 0))) if Sq != S else q
    kp = jnp.pad(k, ((0, 0), (0, Sk - S), (0, 0), (0, 0))) if Sk != S else k
    vp = jnp.pad(v, ((0, 0), (0, Sk - S), (0, 0), (0, 0))) if Sk != S else v

    # bf16 tiles: the MXU's native precision (f32 inputs would run the slow
    # multi-pass f32 matmul path inside Mosaic); accumulation stays f32
    qh = qp.transpose(0, 2, 1, 3).reshape(B * H, Sq, Dh).astype(jnp.bfloat16)
    kh = kp.transpose(0, 2, 1, 3).reshape(B * H, Sk, Dh).astype(jnp.bfloat16)
    vh = vp.transpose(0, 2, 1, 3).reshape(B * H, Sk, Dh).astype(jnp.bfloat16)

    extra_specs, extra_args = [], []
    has_pad = pad_mask is not None
    if has_pad:
        pad_add = jnp.where(pad_mask, 0.0, NEG).astype(jnp.float32)  # (B, S)
        if Sk != S:
            pad_add = jnp.pad(pad_add, ((0, 0), (0, Sk - S)), constant_values=2.0 * NEG)
        # (B, 1, Sk) so the (1, 1, block_k) tile satisfies TPU tiling rules
        extra_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // H, 0, j))
        )
        extra_args.append(pad_add[:, None, :])

    has_bias = bias is not None
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        bias_f = bias.astype(jnp.float32)
        if Sq != S or Sk != S:
            bias_f = jnp.pad(
                bias_f, ((0, 0), (0, 0), (0, Sq - S), (0, Sk - S)),
                constant_values=0.0,
            )
        bias_f = bias_f.reshape(Bb * Hb, Sq, Sk)
        if Bb == 1 and Hb == 1:
            bmap = lambda b, i, j: (0, i, j)  # noqa: E731
        elif Bb == 1:
            bmap = lambda b, i, j: (b % H, i, j)  # noqa: E731
        elif Hb == 1:
            bmap = lambda b, i, j: (b // H, i, j)  # noqa: E731
        else:
            bmap = lambda b, i, j: (b, i, j)  # noqa: E731
        extra_specs.append(pl.BlockSpec((1, block_q, block_k), bmap))
        extra_args.append(bias_f)

    return dict(
        B=B, S=S, H=H, Dh=Dh, Sq=Sq, Sk=Sk,
        block_q=block_q, block_k=block_k,
        qh=qh, kh=kh, vh=vh,
        has_pad=has_pad, has_bias=has_bias,
        extra_specs=extra_specs, extra_args=extra_args,
    )


def _flash_forward(q, k, v, bias, pad_mask, causal, block_q, block_k, interpret,
                   want_lse=False):
    P_ = _prep(q, k, v, bias, pad_mask, block_q, block_k)
    B, S, H, Dh = P_["B"], P_["S"], P_["H"], P_["Dh"]
    Sq, Sk = P_["Sq"], P_["Sk"]
    block_q, block_k = P_["block_q"], P_["block_k"]

    in_specs = [
        pl.BlockSpec((1, block_q, Dh), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, Dh), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, Dh), lambda b, i, j: (b, j, 0)),
        *P_["extra_specs"],
    ]
    args = [P_["qh"], P_["kh"], P_["vh"], *P_["extra_args"]]

    kernel = _make_kernel(causal, P_["has_pad"], P_["has_bias"], H,
                          block_q, block_k, S)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, Sq // block_q, Sk // block_k),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    out4 = out.reshape(B, H, Sq, Dh).transpose(0, 2, 1, 3)[:, :S]
    if want_lse:
        return out4, out, lse  # out kept flat for the bwd delta computation
    return out4


# dq full-sequence scratch cap for the single-pass backward (f32 bytes).
# Measured (v5e, B=4 H=8 Dh=64, causal, bf16): single-pass vs split kernels
# 2.20 vs 2.24 ms @S=1024, 3.21 vs 4.45 ms @S=2048, 23.0 vs 351.9 ms @S=8192
# (split's dq kernel degrades badly at long S; XLA's materialized bwd OOMs).
_BWD_DQ_SCRATCH_MAX_BYTES = 8 << 20


def _flash_backward(q, k, v, bias, pad_mask, causal, block_q, block_k,
                    interpret, o_flat, lse, g):
    """Fused flash backward. Preferred path: ONE kernel producing dq/dk/dv
    from a single logits recomputation (dq in full-Sq VMEM scratch); falls
    back to split dq + dkv kernels when Sq·Dh exceeds the scratch budget.
    delta = rowsum(dO ⊙ O) computed in XLA."""
    P_ = _prep(q, k, v, bias, pad_mask, block_q, block_k)
    B, S, H, Dh = P_["B"], P_["S"], P_["H"], P_["Dh"]
    Sq, Sk = P_["Sq"], P_["Sk"]
    block_q, block_k = P_["block_q"], P_["block_k"]

    gp = jnp.pad(g, ((0, 0), (0, Sq - S), (0, 0), (0, 0))) if Sq != S else g
    doh32 = gp.transpose(0, 2, 1, 3).reshape(B * H, Sq, Dh).astype(jnp.float32)
    delta = (doh32 * o_flat.astype(jnp.float32)).sum(-1, keepdims=True)  # (BH,Sq,1)
    doh = doh32.astype(jnp.bfloat16)

    qspec = pl.BlockSpec((1, block_q, Dh), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, block_k, Dh), lambda b, i, j: (b, j, 0))
    rowspec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))
    common_args = [P_["qh"], P_["kh"], P_["vh"], doh, lse, delta,
                   *P_["extra_args"]]

    # single-pass kernel when the full-Sq dq scratch fits in VMEM: one logits
    # recompute for all three grads (5 S²-GEMMs/tile vs 7 split)
    if Sq * Dh * 4 <= _BWD_DQ_SCRATCH_MAX_BYTES:
        def _reorder2(spec_list):
            out = []
            for sp in spec_list:
                f = sp.index_map
                out.append(pl.BlockSpec(sp.block_shape,
                                        lambda b, kk, qq, f=f: f(b, qq, kk)))
            return out

        fused_kernel = _make_bwd_fused_kernel(
            causal, P_["has_pad"], P_["has_bias"], H, block_q, block_k, S
        )
        qspecF = pl.BlockSpec((1, block_q, Dh), lambda b, kk, qq: (b, qq, 0))
        kspecF = pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0))
        rowspecF = pl.BlockSpec((1, block_q, 1), lambda b, kk, qq: (b, qq, 0))
        dq, dk, dv = pl.pallas_call(
            fused_kernel,
            grid=(B * H, Sk // block_k, Sq // block_q),
            in_specs=[qspecF, kspecF, kspecF, qspecF, rowspecF, rowspecF,
                      *_reorder2(P_["extra_specs"])],
            out_specs=[
                pl.BlockSpec((1, block_q, Dh), lambda b, kk, qq: (b, qq, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0)),
                pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, Dh), jnp.float32),
                pltpu.VMEM((block_k, Dh), jnp.float32),
                pltpu.VMEM((Sq, Dh), jnp.float32),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * H, Sq, Dh), jnp.float32),
                jax.ShapeDtypeStruct((B * H, Sk, Dh), jnp.float32),
                jax.ShapeDtypeStruct((B * H, Sk, Dh), jnp.float32),
            ],
            interpret=interpret,
        )(*common_args)

        def unflatten(x, Sp):
            return x.reshape(B, H, Sp, Dh).transpose(0, 2, 1, 3)[:, :S]

        return (unflatten(dq, Sq).astype(q.dtype),
                unflatten(dk, Sk).astype(k.dtype),
                unflatten(dv, Sk).astype(v.dtype))

    dq_kernel = _make_bwd_dq_kernel(causal, P_["has_pad"], P_["has_bias"], H,
                                    block_q, block_k, S)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, Sq // block_q, Sk // block_k),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec,
                  *P_["extra_specs"]],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, Dh), jnp.float32),
        interpret=interpret,
    )(*common_args)

    # dk/dv: Q minor — pad/bias specs must be re-indexed for the (b, ki, qi)
    # grid order
    def _reorder(spec_list):
        out = []
        for sp in spec_list:
            f = sp.index_map
            out.append(pl.BlockSpec(sp.block_shape,
                                    lambda b, kk, qq, f=f: f(b, qq, kk)))
        return out

    dkv_kernel = _make_bwd_dkv_kernel(causal, P_["has_pad"], P_["has_bias"], H,
                                      block_q, block_k, S)
    qspec2 = pl.BlockSpec((1, block_q, Dh), lambda b, kk, qq: (b, qq, 0))
    kspec2 = pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0))
    rowspec2 = pl.BlockSpec((1, block_q, 1), lambda b, kk, qq: (b, qq, 0))
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, Sk // block_k, Sq // block_q),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2,
                  *_reorder(P_["extra_specs"])],
        out_specs=[
            pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, kk, qq: (b, kk, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, Dh), jnp.float32),
            pltpu.VMEM((block_k, Dh), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sk, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Sk, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(*common_args)

    def unflatten(x, Sp):
        return x.reshape(B, H, Sp, Dh).transpose(0, 2, 1, 3)[:, :S]

    return (unflatten(dq, Sq).astype(q.dtype),
            unflatten(dk, Sk).astype(k.dtype),
            unflatten(dv, Sk).astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    bias_grad: bool = False,
) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, S, H, Dh); ``bias`` broadcastable to
    (B, H, S, S) (perm/local/relative); ``pad_mask``: (B, S) bool valid-key
    mask; ``causal`` applied inline.

    ``bias_grad``: set True when ``bias`` carries LEARNED parameters (e.g.
    RelativePositionBias) — the backward then runs a rematerialized XLA vjp
    that produces the bias cotangent (materializes the (B, H, S, S)
    probabilities; the O(S) fused backward cannot emit it). With the default
    False the fused backward runs and the bias cotangent is zero — correct
    ONLY for constant biases (perm/segment/local-window masks). The encoder
    sets this flag automatically from its rel-bias configuration."""
    return _flash_forward(q, k, v, bias, pad_mask, causal, block_q, block_k, interpret)


def _flash_fwd(q, k, v, bias, pad_mask, causal, block_q, block_k, interpret,
               bias_grad):
    out, o_flat, lse = _flash_forward(
        q, k, v, bias, pad_mask, causal, block_q, block_k, interpret,
        want_lse=True,
    )
    return out, (q, k, v, bias, pad_mask, o_flat, lse)


# Below this sequence length the backward re-runs through XLA (materializing
# the (B,H,S,S) probabilities); at/above it the O(S) fused kernels run (the
# only thing that fits in HBM at S=8192). Re-tuned to 0 — always fused when
# flash is engaged (use_flash gates at S>=128): across 4 independent runs at
# S=128..8192 the fused single-pass backward measured 1.1-6.4 ms while the
# XLA-remat arm never beat 14 ms on this backend and was often pathological
# (0.8-1.8 s at S=128). benchmarks/attention_bwd_ab.py reproduces the A/B.
FUSED_BWD_MIN_SEQ = 0


def _flash_bwd(causal, block_q, block_k, interpret, bias_grad, res, g):
    q, k, v, bias, pad_mask, o_flat, lse = res
    S = q.shape[1]
    if bias is not None and bias_grad:
        # learned bias (rel-position tables): the fused backward cannot emit
        # a bias cotangent, so rematerialize through XLA for ALL cotangents —
        # O(S²) memory, paid only when the bias actually carries parameters
        _, vjp = jax.vjp(
            lambda q_, k_, v_, b_: reference_attention(
                q_, k_, v_, bias=b_, pad_mask=pad_mask, causal=causal
            ),
            q, k, v, bias,
        )
        dq, dk, dv, dbias = vjp(g)
        return dq, dk, dv, dbias, None
    if S < FUSED_BWD_MIN_SEQ and not interpret:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, bias=bias, pad_mask=pad_mask, causal=causal
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None
    dq, dk, dv = _flash_backward(
        q, k, v, bias, pad_mask, causal, block_q, block_k, interpret,
        o_flat, lse, g,
    )
    return dq, dk, dv, None, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def use_flash(seq_len: int, attn_dropout: float, training: bool) -> bool:
    """Dispatch policy for MultiHeadAttention."""
    from .vocab import _on_tpu  # single platform probe for all ops

    return _on_tpu() and seq_len >= 128 and not (
        training and attn_dropout > 0.0
    )
