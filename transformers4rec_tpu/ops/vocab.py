"""Fused large-vocab output ops: softmax-CE, label rank, top-k.

The hot op of the whole framework (SURVEY.md §3.1: "vocab-size GEMM" in
_NextItemPredictionTask, reference prediction_task.py:648-696): scoring
(N, E) hidden states against a (V, E) item table with V up to 390k–100M.
Materializing (N, V) logits costs gigabytes of HBM traffic per step — measured
~33ms of a 42ms train step at the REES46 config on TPU v5e.

Pallas TPU kernels stream the vocab in VMEM-resident tiles:
- ``fused_softmax_ce``: online-logsumexp CE forward + all-GEMM custom backward
  (dW = Pᵀ(coef·x) per tile, dx = ΣP·W) — logits never touch HBM.
- ``fused_label_rank``: exact rank of the label logit via streaming
  count-of-greater — replaces top-k + one-hot for single-label ranking
  metrics (SURVEY.md §7.4 point 5).
- ``fused_topk``: streamed top-k merge over vocab tiles for serving.

Every op has a pure-JAX ``lax.scan`` fallback (used on CPU and as the
numerics reference in tests). bf16 GEMM inputs, f32 accumulation throughout.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pad_rows(W: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    V = W.shape[0]
    Vp = ((V + multiple - 1) // multiple) * multiple
    if Vp != V:
        W = jnp.pad(W, ((0, Vp - V), (0, 0)))
    return W, Vp


# =========================================================================
# forward: online-logsumexp + label logit
# =========================================================================


def _ce_fwd_kernel(smooth, v_total_ref, x_ref, w_ref, lbl_ref, lse_ref, ll_ref,
                   *rest):
    """Grid (nN, nV), V minor. Scratch (m, s, ll) persists across the V loop.
    ``smooth`` (static) adds a streamed sum-of-valid-logits output for the
    label-smoothing term — loss = lse − (1−ε)·ll − (ε/V)·zsum."""
    if smooth:
        zs_ref, m_sc, s_sc, ll_sc, zs_sc = rest
    else:
        m_sc, s_sc, ll_sc = rest
    vi = pl.program_id(1)
    nv = pl.num_programs(1)
    BV = w_ref.shape[0]

    @pl.when(vi == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        s_sc[:] = jnp.zeros_like(s_sc)
        ll_sc[:] = jnp.zeros_like(ll_sc)
        if smooth:
            zs_sc[:] = jnp.zeros_like(zs_sc)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BV)
    col0 = vi * BV
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    if smooth:
        zs_sc[:, 0] = zs_sc[:, 0] + jnp.where(valid, logits, 0.0).sum(axis=1)
    logits = jnp.where(valid, logits, NEG)

    m_prev = m_sc[:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=1))
    s_sc[:, 0] = s_sc[:, 0] * jnp.exp(m_prev - m_new) + jnp.exp(
        logits - m_new[:, None]
    ).sum(axis=1)
    m_sc[:, 0] = m_new

    is_label = col == lbl_ref[:]  # (BN, BV) vs (BN, 1) broadcast
    ll_sc[:, 0] = ll_sc[:, 0] + jnp.where(is_label, logits, 0.0).sum(axis=1)

    @pl.when(vi == nv - 1)
    def _():
        lse_ref[:, 0] = m_sc[:, 0] + jnp.log(s_sc[:, 0])
        ll_ref[:, 0] = ll_sc[:, 0]
        if smooth:
            zs_ref[:, 0] = zs_sc[:, 0]


def _ce_fwd_kernel_vmajor(smooth, v_total_ref, x_ref, w_ref, lbl_ref, lse_ref,
                          ll_ref, *rest):
    """Grid (nV, nN), N minor: the (V, E) table streams through VMEM ONCE for
    the whole pass (vs once per N-block with a V-minor grid — at the REES46
    config that was 7×150MB = 1GB of HBM reads per forward). Online-softmax
    accumulators for ALL row blocks live in a (Np, 1) VMEM scratch, sliced per
    N block. ``smooth`` (static) adds the sum-of-valid-logits stream for
    label smoothing."""
    if smooth:
        zs_ref, m_sc, s_sc, ll_sc, zs_sc = rest
    else:
        m_sc, s_sc, ll_sc = rest
    vi, ni = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(0)
    BN = x_ref.shape[0]
    BV = w_ref.shape[0]
    sl = pl.ds(ni * BN, BN)

    @pl.when(vi == 0)
    def _():
        m_sc[sl, :] = jnp.full((BN, 1), NEG, jnp.float32)
        s_sc[sl, :] = jnp.zeros((BN, 1), jnp.float32)
        ll_sc[sl, :] = jnp.zeros((BN, 1), jnp.float32)
        if smooth:
            zs_sc[sl, :] = jnp.zeros((BN, 1), jnp.float32)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BV)
    col = vi * BV + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    if smooth:
        zs_sc[sl, :] = zs_sc[sl, :] + jnp.where(valid, logits, 0.0).sum(
            axis=1
        )[:, None]
    logits = jnp.where(valid, logits, NEG)

    m_prev = m_sc[sl, :][:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=1))
    s_new = s_sc[sl, :][:, 0] * jnp.exp(m_prev - m_new) + jnp.exp(
        logits - m_new[:, None]
    ).sum(axis=1)
    m_sc[sl, :] = m_new[:, None]
    s_sc[sl, :] = s_new[:, None]

    is_label = col == lbl_ref[:]
    ll_sc[sl, :] = ll_sc[sl, :] + jnp.where(is_label, logits, 0.0).sum(
        axis=1
    )[:, None]

    @pl.when(vi == nv - 1)
    def _():
        lse_ref[:, :] = m_sc[sl, :] + jnp.log(s_sc[sl, :])
        ll_ref[:, :] = ll_sc[sl, :]
        if smooth:
            zs_ref[:, :] = zs_sc[sl, :]


def _ce_fwd_pallas_vmajor(x, W, labels, bn: int, bv: int, vocab_size=None,
                          smooth: bool = False):
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, bv)
    Np = ((N + bn - 1) // bn) * bn
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
    lblp = jnp.pad(labels, (0, Np - N)) if Np != N else labels

    n_out = 3 if smooth else 2
    grid = (Vp // bv, Np // bn)  # V MAJOR: table streamed once
    outs = pl.pallas_call(
        functools.partial(_ce_fwd_kernel_vmajor, smooth),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, E), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bv, E), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0))
            ] * n_out,
            scratch_shapes=[
                pltpu.VMEM((Np, 1), jnp.float32)
            ] * (n_out + 1),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32)
        ] * n_out,
    )(
        jnp.full((1,), V, jnp.int32),
        xp.astype(jnp.bfloat16),
        Wp.astype(jnp.bfloat16),
        lblp[:, None].astype(jnp.int32),
    )
    if smooth:
        lse, ll, zs = outs
        return lse[:N, 0], ll[:N, 0], zs[:N, 0]
    lse, ll = outs
    return lse[:N, 0], ll[:N, 0], None


# full-row scratch caps: stay well under the ~16MB VMEM budget
_FWD_SCRATCH_MAX_BYTES = 8 << 20
_BWD_DX_SCRATCH_MAX_BYTES = 8 << 20


def _ce_fwd_pallas(x, W, labels, bn: int, bv: int, vocab_size=None,
                   smooth: bool = False):
    # v-major keeps (n_out + 1) full-N f32 scratch columns resident — gate on
    # the actual BYTES (smoothing adds a 4th/5th column) so a large-N smooth
    # forward dispatches to n-major instead of overflowing VMEM
    n_scratch = (3 if smooth else 2) + 1
    np_rows = -(-x.shape[0] // bn) * bn
    if n_scratch * np_rows * 4 <= _FWD_SCRATCH_MAX_BYTES:
        return _ce_fwd_pallas_vmajor(x, W, labels, bn, bv, vocab_size, smooth)
    return _ce_fwd_pallas_nmajor(x, W, labels, bn, bv, vocab_size, smooth)


def _ce_fwd_pallas_nmajor(x, W, labels, bn: int, bv: int, vocab_size=None,
                          smooth: bool = False):
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, bv)
    Np = ((N + bn - 1) // bn) * bn
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
    lblp = jnp.pad(labels, (0, Np - N)) if Np != N else labels

    n_out = 3 if smooth else 2
    grid = (Np // bn, Vp // bv)
    outs = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, smooth),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, E), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((bv, E), lambda i, j, *_: (j, 0)),
                pl.BlockSpec((bn, 1), lambda i, j, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, 1), lambda i, j, *_: (i, 0))
            ] * n_out,
            scratch_shapes=[
                pltpu.VMEM((bn, 1), jnp.float32)
            ] * (n_out + 1),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32)
        ] * n_out,
    )(
        jnp.full((1,), V, jnp.int32),
        xp.astype(jnp.bfloat16),
        Wp.astype(jnp.bfloat16),
        lblp[:, None].astype(jnp.int32),
    )
    if smooth:
        lse, ll, zs = outs
        return lse[:N, 0], ll[:N, 0], zs[:N, 0]
    lse, ll = outs
    return lse[:N, 0], ll[:N, 0], None


def _ce_fwd_scan(x, W, labels, chunk: int, vocab_size=None,
                 smooth: bool = False):
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, chunk)
    xb = x.astype(jnp.bfloat16)
    Wb = Wp.astype(jnp.bfloat16).reshape(Vp // chunk, chunk, E)

    def body(carry, args):
        m, s, ll, zs = carry
        Wc, idx0 = args
        logits = jnp.einsum("ne,ce->nc", xb, Wc, preferred_element_type=jnp.float32)
        col = idx0 + jnp.arange(chunk)
        valid = (col < V)[None, :]
        if smooth:
            zs = zs + jnp.where(valid, logits, 0.0).sum(-1)
        logits = jnp.where(valid, logits, NEG)
        m_new = jnp.maximum(m, logits.max(-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(logits - m_new[:, None]).sum(-1)
        ll = ll + jnp.where(col[None, :] == labels[:, None], logits, 0.0).sum(-1)
        return (m_new, s, ll, zs), None

    init = (jnp.full((N,), NEG), jnp.zeros((N,)), jnp.zeros((N,)),
            jnp.zeros((N,)))
    idxs = jnp.arange(Vp // chunk) * chunk
    (m, s, ll, zs), _ = jax.lax.scan(body, init, (Wb, idxs))
    return m + jnp.log(s), ll, (zs if smooth else None)


# =========================================================================
# backward: dx (V-minor accumulation) and dW (N-minor accumulation)
# =========================================================================


def _ce_bwd_fused_kernel(eps, eps_over_v, v_total_ref, x_ref, w_ref, lbl_ref,
                         lse_ref, coef_ref, dw_ref, dxp_ref, acc_sc):
    """One logits pass produces BOTH gradients: grid (nV outer, nN inner);
    dW tile accumulates in scratch across N, dx partials per V-tile are
    written out and summed by the caller. ``eps`` (static label smoothing)
    turns the residual into P − y_smooth = P − (1−ε)·onehot − ε/V."""
    ni = pl.program_id(1)
    nn = pl.num_programs(1)
    vi = pl.program_id(0)
    BV = w_ref.shape[0]

    @pl.when(ni == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = vi * BV + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    if eps:
        p = jnp.where(valid, jnp.exp(logits - lse_ref[:]) - eps_over_v, 0.0)
        p = p - (1.0 - eps) * jnp.where(col == lbl_ref[:], 1.0, 0.0)
    else:
        p = jnp.where(valid, jnp.exp(logits - lse_ref[:]), 0.0)
        p = p - jnp.where(col == lbl_ref[:], 1.0, 0.0)
    p = (p * coef_ref[:]).astype(jnp.bfloat16)
    acc_sc[:, :] += jax.lax.dot_general(
        p, x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxp_ref[0, :, :] = jax.lax.dot_general(
        p, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == nn - 1)
    def _():
        dw_ref[:, :] = acc_sc[:, :]


def _ce_bwd_fused_kernel_dxsc(eps, eps_over_v, v_total_ref, x_ref, w_ref,
                              lbl_ref, lse_ref, coef_ref, dw_ref, dx_ref,
                              dw_sc, dx_sc):
    """Like _ce_bwd_fused_kernel but dx accumulates in a full-N (Np, E) VMEM
    scratch instead of writing per-V-tile partials to HBM (which cost ~0.5GB
    of round-trip traffic per step at the REES46 config)."""
    vi, ni = pl.program_id(0), pl.program_id(1)
    nn = pl.num_programs(1)
    nv = pl.num_programs(0)
    BN = x_ref.shape[0]
    BV = w_ref.shape[0]
    sl = pl.ds(ni * BN, BN)

    @pl.when(ni == 0)
    def _():
        dw_sc[:] = jnp.zeros_like(dw_sc)

    @pl.when(vi == 0)
    def _():
        dx_sc[sl, :] = jnp.zeros((BN, dx_sc.shape[1]), jnp.float32)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = vi * BV + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    if eps:
        p = jnp.where(valid, jnp.exp(logits - lse_ref[:]) - eps_over_v, 0.0)
        p = p - (1.0 - eps) * jnp.where(col == lbl_ref[:], 1.0, 0.0)
    else:
        p = jnp.where(valid, jnp.exp(logits - lse_ref[:]), 0.0)
        p = p - jnp.where(col == lbl_ref[:], 1.0, 0.0)
    p = (p * coef_ref[:]).astype(jnp.bfloat16)
    dw_sc[:, :] += jax.lax.dot_general(
        p, x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_sc[sl, :] += jax.lax.dot_general(
        p, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == nn - 1)
    def _():
        dw_ref[:, :] = dw_sc[:, :]

    @pl.when(vi == nv - 1)
    def _():
        dx_ref[:, :] = dx_sc[sl, :]


def _ce_bwd_pallas_dxsc(x, W, labels, lse, coef, bn: int, bv: int,
                        vocab_size=None, eps: float = 0.0,
                        eps_over_v: Optional[float] = None):
    bv = min(bv, 2048)
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, bv)
    Np = ((N + bn - 1) // bn) * bn
    pad_n = Np != N
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if pad_n else x
    lblp = jnp.pad(labels, (0, Np - N), constant_values=-1) if pad_n else labels
    lsep = jnp.pad(lse, (0, Np - N)) if pad_n else lse
    coefp = jnp.pad(coef, (0, Np - N)) if pad_n else coef

    nv = Vp // bv
    dW, dx = pl.pallas_call(
        functools.partial(_ce_bwd_fused_kernel_dxsc, eps,
                          eps / V if eps_over_v is None else eps_over_v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nv, Np // bn),  # V outer, N inner: W streamed once
            in_specs=[
                pl.BlockSpec((bn, E), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bv, E), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bv, E), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((bn, E), lambda j, i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bv, E), jnp.float32),
                pltpu.VMEM((Np, E), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Vp, E), jnp.float32),
            jax.ShapeDtypeStruct((Np, E), jnp.float32),
        ],
    )(
        jnp.full((1,), V, jnp.int32),
        xp.astype(jnp.bfloat16),
        Wp.astype(jnp.bfloat16),
        lblp[:, None].astype(jnp.int32),
        lsep[:, None].astype(jnp.float32),
        coefp[:, None].astype(jnp.float32),
    )
    return dx[:N], dW[:W.shape[0]]


def _ce_bwd_pallas_fused(x, W, labels, lse, coef, bn: int, bv: int,
                         vocab_size=None, eps: float = 0.0,
                         eps_over_v: Optional[float] = None):
    """``eps_over_v`` overrides the ε/V smoothing spread when ``vocab_size``
    is a traced per-shard bound but the GLOBAL vocab is static (the
    vocab-parallel path — parallel/sharded_embedding.py)."""
    N, E = x.shape
    Np = ((N + bn - 1) // bn) * bn
    if Np * E * 4 <= _BWD_DX_SCRATCH_MAX_BYTES:
        return _ce_bwd_pallas_dxsc(x, W, labels, lse, coef, bn, bv, vocab_size,
                                   eps, eps_over_v)
    return _ce_bwd_pallas_fused_partials(x, W, labels, lse, coef, bn, bv,
                                         vocab_size, eps, eps_over_v)


def _ce_bwd_pallas_fused_partials(x, W, labels, lse, coef, bn: int, bv: int,
                                  vocab_size=None, eps: float = 0.0,
                                  eps_over_v: Optional[float] = None):
    bv = min(bv, 2048)
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, bv)
    Np = ((N + bn - 1) // bn) * bn
    pad_n = Np != N
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if pad_n else x
    lblp = jnp.pad(labels, (0, Np - N), constant_values=-1) if pad_n else labels
    lsep = jnp.pad(lse, (0, Np - N)) if pad_n else lse
    coefp = jnp.pad(coef, (0, Np - N)) if pad_n else coef

    nv = Vp // bv
    dW, dxp = pl.pallas_call(
        functools.partial(_ce_bwd_fused_kernel, eps,
                          eps / V if eps_over_v is None else eps_over_v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nv, Np // bn),  # V outer, N inner
            in_specs=[
                pl.BlockSpec((bn, E), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bv, E), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bv, E), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((1, bn, E), lambda j, i, *_: (j, i, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((bv, E), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Vp, E), jnp.float32),
            jax.ShapeDtypeStruct((nv, Np, E), jnp.float32),
        ],
    )(
        jnp.full((1,), V, jnp.int32),
        xp.astype(jnp.bfloat16),
        Wp.astype(jnp.bfloat16),
        lblp[:, None].astype(jnp.int32),
        lsep[:, None].astype(jnp.float32),
        coefp[:, None].astype(jnp.float32),
    )
    dx = dxp.sum(axis=0)
    return dx[:N], dW[:W.shape[0]]


def _ce_bwd_scan(x, W, labels, lse, coef, chunk: int, vocab_size=None,
                 eps: float = 0.0, eps_over_v: Optional[float] = None):
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    eov = eps / V if eps_over_v is None else eps_over_v
    Wp, Vp = _pad_rows(W, chunk)
    xb = x.astype(jnp.bfloat16)
    Wb = Wp.astype(jnp.bfloat16).reshape(Vp // chunk, chunk, E)

    def body(dx, args):
        Wc, idx0 = args
        logits = jnp.einsum("ne,ce->nc", xb, Wc, preferred_element_type=jnp.float32)
        col = idx0 + jnp.arange(chunk)
        valid = (col < V)[None, :]
        if eps:
            p = jnp.where(valid, jnp.exp(logits - lse[:, None]) - eov, 0.0)
            p = p - (1.0 - eps) * (col[None, :] == labels[:, None]).astype(
                jnp.float32
            )
        else:
            p = jnp.where(valid, jnp.exp(logits - lse[:, None]), 0.0)
            p = p - (col[None, :] == labels[:, None]).astype(jnp.float32)
        p = p * coef[:, None]
        dWc = jnp.einsum("nc,ne->ce", p.astype(jnp.bfloat16), xb,
                         preferred_element_type=jnp.float32)
        dx = dx + jnp.einsum("nc,ce->ne", p.astype(jnp.bfloat16), Wc,
                             preferred_element_type=jnp.float32)
        return dx, dWc

    idxs = jnp.arange(Vp // chunk) * chunk
    dx, dWs = jax.lax.scan(body, jnp.zeros((N, E), jnp.float32), (Wb, idxs))
    dW = dWs.reshape(Vp, E)[:W.shape[0]]
    return dx, dW


# =========================================================================
# public op
# =========================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_softmax_ce(
    x: jnp.ndarray,
    W: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    vocab_size: Optional[int] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Weighted-mean CE of ``x @ W.T`` vs ``labels`` without materializing
    logits. x: (N, E); W: (V, E); labels: (N,) int; weights: (N,) float.
    ``vocab_size`` bounds the true vocab when W carries padded rows
    (features/embedding.py vocab_padding_multiple) — rows ≥ vocab_size are
    excluded from the softmax and receive zero gradient.

    ``weights`` is explicitly NON-differentiable (stop_gradient at entry):
    it is a validity mask, and the custom backward returns no cotangent for
    it — learned per-row loss weighting would need the dense CE path."""
    weights = jax.lax.stop_gradient(weights)
    loss, _ = _fused_ce_fwd(x, W, labels, weights, block_n, block_v,
                            use_pallas, vocab_size, label_smoothing)
    return loss


def _ce_forward_dispatch(x, W, labels, block_n, block_v, use_pallas,
                         vocab_size=None, smooth=False):
    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    if on_tpu:
        return _ce_fwd_pallas(x, W, labels, block_n, block_v, vocab_size,
                              smooth)
    return _ce_fwd_scan(x, W, labels, block_v, vocab_size, smooth)


def _smoothed_nll(lse, ll, zs, eps, V):
    """Per-row loss: lse − (1−ε)·ll − (ε/V)·zsum (== torch CrossEntropyLoss
    label_smoothing semantics, losses.py:32-35)."""
    if eps:
        return lse - (1.0 - eps) * ll - (eps / V) * zs
    return lse - ll


def _fused_ce_fwd(x, W, labels, weights, block_n, block_v, use_pallas,
                  vocab_size, label_smoothing=0.0):
    eps = label_smoothing
    lse, ll, zs = _ce_forward_dispatch(x, W, labels, block_n, block_v,
                                       use_pallas, vocab_size, smooth=eps > 0)
    V = W.shape[0] if vocab_size is None else vocab_size
    w = weights.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)
    loss = (_smoothed_nll(lse, ll, zs, eps, V) * w).sum() / wsum
    return loss, (x, W, labels, w, wsum, lse)


def _fused_ce_bwd(block_n, block_v, use_pallas, vocab_size, label_smoothing,
                  res, g):
    x, W, labels, w, wsum, lse = res
    coef = g * w / wsum  # (N,)
    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    if on_tpu:
        dx, dW = _ce_bwd_pallas_fused(x, W, labels, lse, coef, block_n, block_v,
                                      vocab_size, label_smoothing)
    else:
        dx, dW = _ce_bwd_scan(x, W, labels, lse, coef, block_v, vocab_size,
                              label_smoothing)
    return dx.astype(x.dtype), dW.astype(W.dtype), None, None


fused_softmax_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


# =========================================================================
# label rank (streaming count-of-greater) — for ranking metrics
# =========================================================================


def _rank_kernel(v_total_ref, x_ref, w_ref, lbl_ref, ll_ref, rank_ref, cnt_sc):
    vi = pl.program_id(1)
    nv = pl.num_programs(1)
    BV = w_ref.shape[0]

    @pl.when(vi == 0)
    def _():
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = vi * BV + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    greater = valid & (logits > ll_ref[:])
    # int32 accumulation: f32 counts lose exactness past 2^24, i.e. ranks
    # deeper than ~16.7M at the 100M-vocab north star
    cnt_sc[:, 0] += greater.sum(axis=1).astype(jnp.int32)

    @pl.when(vi == nv - 1)
    def _():
        rank_ref[:, 0] = cnt_sc[:, 0]


def rank_counts(
    x: jnp.ndarray,
    W: jnp.ndarray,
    ll: jnp.ndarray,
    labels: jnp.ndarray,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    vocab_size: Optional[int] = None,
) -> jnp.ndarray:
    """Count of logits of ``x @ W.T`` strictly greater than the given label
    logits ``ll`` (N,). When ``ll`` came from the streamed forward's
    col==label accumulation, the label's own column compares bit-equal and is
    never counted — no explicit exclusion needed. ``vocab_size`` may be a
    TRACED scalar (vocab-parallel shards pass per-shard bounds)."""
    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    if on_tpu:
        Wp, Vp = _pad_rows(W, block_v)
        Np = ((N + block_n - 1) // block_n) * block_n
        xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
        lblp = jnp.pad(labels, (0, Np - N)) if Np != N else labels
        llp = jnp.pad(ll, (0, Np - N)) if Np != N else ll
        rank = pl.pallas_call(
            _rank_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Np // block_n, Vp // block_v),
                in_specs=[
                    pl.BlockSpec((block_n, E), lambda i, j, *_: (i, 0)),
                    pl.BlockSpec((block_v, E), lambda i, j, *_: (j, 0)),
                    pl.BlockSpec((block_n, 1), lambda i, j, *_: (i, 0)),
                    pl.BlockSpec((block_n, 1), lambda i, j, *_: (i, 0)),
                ],
                out_specs=pl.BlockSpec((block_n, 1), lambda i, j, *_: (i, 0)),
                scratch_shapes=[pltpu.VMEM((block_n, 1), jnp.int32)],
            ),
            out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        )(
            jnp.full((1,), V, jnp.int32),
            xp.astype(jnp.bfloat16),
            Wp.astype(jnp.bfloat16),
            lblp[:, None].astype(jnp.int32),
            llp[:, None].astype(jnp.float32),
        )
        return rank[:N, 0]
    Wp, Vp = _pad_rows(W, block_v)
    xb = x.astype(jnp.bfloat16)
    Wb = Wp.astype(jnp.bfloat16).reshape(Vp // block_v, block_v, E)

    def body(cnt, args):
        Wc, idx0 = args
        logits = jnp.einsum("ne,ce->nc", xb, Wc,
                            preferred_element_type=jnp.float32)
        col = idx0 + jnp.arange(block_v)
        greater = (col < V)[None, :] & (logits > ll[:, None])
        return cnt + greater.sum(-1).astype(jnp.int32), None

    idxs = jnp.arange(Vp // block_v) * block_v
    rank, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.int32), (Wb, idxs))
    return rank


def fused_label_rank(
    x: jnp.ndarray,
    W: jnp.ndarray,
    labels: jnp.ndarray,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    vocab_size: Optional[int] = None,
) -> jnp.ndarray:
    """Exact 0-based rank of each label's logit among all V logits
    (count of strictly-greater logits). Never materializes (N, V) nor sorts.
    Equivalent to ``label_ranks(scores, labels, max_k)`` for rank < max_k.
    The label logit comes from the CE forward's col==label accumulation, so
    its own column compares bit-equal in ``rank_counts`` and is never
    counted."""
    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    if on_tpu:
        _, ll, _ = _ce_fwd_pallas(x, W, labels, block_n, block_v, vocab_size)
    else:
        _, ll, _ = _ce_fwd_scan(x, W, labels, block_v, vocab_size)
    return rank_counts(x, W, ll, labels, block_n, block_v,
                       use_pallas=use_pallas, vocab_size=vocab_size)


# =========================================================================
# fused eval: CE + label rank in ONE vocab pass
# =========================================================================


def _ce_rank_kernel(smooth, v_total_ref, x_ref, w_ref, lbl_ref, ll_ref,
                    lse_ref, rank_ref, *rest):
    """Grid (nV, nN), V MAJOR (table streamed once). The label logit arrives
    precomputed (an O(N·E) gather-dot outside the kernel), so ONE streaming
    pass yields both the online logsumexp and the count-of-greater rank —
    eval previously needed three (N, V) GEMM passes (CE fwd, rank's
    label-logit pass, rank pass). Accumulators for all row blocks live in
    (Np, 1) VMEM scratch. ``smooth`` (static) streams the sum of valid
    logits too, for label-smoothed eval CE."""
    if smooth:
        zs_ref, m_sc, s_sc, cnt_sc, zs_sc = rest
    else:
        m_sc, s_sc, cnt_sc = rest
    vi, ni = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(0)
    BN = x_ref.shape[0]
    BV = w_ref.shape[0]
    sl = pl.ds(ni * BN, BN)

    @pl.when(vi == 0)
    def _():
        m_sc[sl, :] = jnp.full((BN, 1), NEG, jnp.float32)
        s_sc[sl, :] = jnp.zeros((BN, 1), jnp.float32)
        cnt_sc[sl, :] = jnp.zeros((BN, 1), jnp.int32)
        if smooth:
            zs_sc[sl, :] = jnp.zeros((BN, 1), jnp.float32)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BV)
    col = vi * BV + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < v_total_ref[0]
    if smooth:
        zs_sc[sl, :] = zs_sc[sl, :] + jnp.where(valid, logits, 0.0).sum(
            axis=1
        )[:, None]
    masked = jnp.where(valid, logits, NEG)

    m_prev = m_sc[sl, :][:, 0]
    m_new = jnp.maximum(m_prev, masked.max(axis=1))
    s_new = s_sc[sl, :][:, 0] * jnp.exp(m_prev - m_new) + jnp.exp(
        masked - m_new[:, None]
    ).sum(axis=1)
    m_sc[sl, :] = m_new[:, None]
    s_sc[sl, :] = s_new[:, None]

    # exclude the label's own column: its gathered logit may differ from the
    # MXU tile value in the last ulp, which would off-by-one the rank.
    # int32 accumulation: f32 counts lose exactness past 2^24 (ranks deeper
    # than ~16.7M at the 100M-vocab north star)
    greater = valid & (col != lbl_ref[:]) & (logits > ll_ref[:])
    cnt_sc[sl, :] = cnt_sc[sl, :] + greater.sum(axis=1).astype(
        jnp.int32
    )[:, None]

    @pl.when(vi == nv - 1)
    def _():
        lse_ref[:, :] = m_sc[sl, :] + jnp.log(s_sc[sl, :])
        rank_ref[:, :] = cnt_sc[sl, :]
        if smooth:
            zs_ref[:, :] = zs_sc[sl, :]


def fused_ce_and_rank(
    x: jnp.ndarray,
    W: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    vocab_size: Optional[int] = None,
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-fused weighted-mean CE **and** exact label ranks in a single
    streamed vocab pass (eval-only: not differentiable). Returns
    ``(loss, ranks)`` with ranks 0-based counts of strictly-greater logits.
    """
    labels = labels.astype(jnp.int32)
    xb = x.astype(jnp.bfloat16)
    # O(N·E) label logit: gather label rows, elementwise dot (f32 accum)
    lrows = jnp.take(W, labels, axis=0).astype(jnp.bfloat16)
    ll = jnp.einsum("ne,ne->n", xb, lrows, preferred_element_type=jnp.float32)

    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    eps = label_smoothing
    smooth = eps > 0
    if on_tpu:
        Wp, Vp = _pad_rows(W, block_v)
        Np = ((N + block_n - 1) // block_n) * block_n
        xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
        lblp = jnp.pad(labels, (0, Np - N)) if Np != N else labels
        llp = jnp.pad(ll, (0, Np - N)) if Np != N else ll
        out_shape = [
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((Np, 1), jnp.float32)] if smooth else [])
        outs = pl.pallas_call(
            functools.partial(_ce_rank_kernel, smooth),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Vp // block_v, Np // block_n),  # V major
                in_specs=[
                    pl.BlockSpec((block_n, E), lambda j, i, *_: (i, 0)),
                    pl.BlockSpec((block_v, E), lambda j, i, *_: (j, 0)),
                    pl.BlockSpec((block_n, 1), lambda j, i, *_: (i, 0)),
                    pl.BlockSpec((block_n, 1), lambda j, i, *_: (i, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((block_n, 1), lambda j, i, *_: (i, 0))
                ] * len(out_shape),
                scratch_shapes=[
                    pltpu.VMEM((Np, 1), jnp.float32),   # m
                    pltpu.VMEM((Np, 1), jnp.float32),   # s
                    pltpu.VMEM((Np, 1), jnp.int32),     # count-of-greater
                ] + ([pltpu.VMEM((Np, 1), jnp.float32)] if smooth else []),
            ),
            out_shape=out_shape,
        )(
            jnp.full((1,), V, jnp.int32),
            xp.astype(jnp.bfloat16),
            Wp.astype(jnp.bfloat16),
            lblp[:, None].astype(jnp.int32),
            llp[:, None].astype(jnp.float32),
        )
        if smooth:
            lse, rank, zs = outs
            zs = zs[:N, 0]
        else:
            (lse, rank), zs = outs, None
        lse, rank = lse[:N, 0], rank[:N, 0]
    else:
        Wp, Vp = _pad_rows(W, block_v)
        Wb = Wp.astype(jnp.bfloat16).reshape(Vp // block_v, block_v, E)

        def body(carry, args):
            m, s, cnt, zsum = carry
            Wc, idx0 = args
            logits = jnp.einsum("ne,ce->nc", xb, Wc,
                                preferred_element_type=jnp.float32)
            col = idx0 + jnp.arange(block_v)
            valid = (col < V)[None, :]
            if smooth:
                zsum = zsum + jnp.where(valid, logits, 0.0).sum(-1)
            masked = jnp.where(valid, logits, NEG)
            m_new = jnp.maximum(m, masked.max(-1))
            s = s * jnp.exp(m - m_new) + jnp.exp(masked - m_new[:, None]).sum(-1)
            greater = valid & (col[None, :] != labels[:, None]) & (
                logits > ll[:, None]
            )
            return (m_new, s, cnt + greater.sum(-1).astype(jnp.int32), zsum), None

        init = (jnp.full((N,), NEG), jnp.zeros((N,)),
                jnp.zeros((N,), jnp.int32), jnp.zeros((N,)))
        idxs = jnp.arange(Vp // block_v) * block_v
        (m, s, rank, zs), _ = jax.lax.scan(body, init, (Wb, idxs))
        lse = m + jnp.log(s)

    w = weights.astype(jnp.float32)
    nll = _smoothed_nll(lse, ll, zs, eps, V)
    loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    return jax.lax.stop_gradient(loss), rank


# =========================================================================
# streamed top-k (serving / predict)
# =========================================================================


def fused_topk(
    x: jnp.ndarray,
    W: jnp.ndarray,
    k: int,
    chunk: int = 32768,
    vocab_size: Optional[int] = None,
    compute_dtype: Any = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of ``x @ W.T`` via per-chunk top-k + running merge — peak memory
    O(N*chunk) instead of O(N*V). Pure-JAX (the per-chunk top_k is already a
    fused XLA sort over VMEM-sized tiles). ``compute_dtype`` sets the GEMM
    input precision (bf16 default — the training numerics; pass f32 to match
    the small-N·V dense-einsum scoring path exactly)."""
    N, E = x.shape
    V = W.shape[0] if vocab_size is None else vocab_size
    Wp, Vp = _pad_rows(W, chunk)
    xb = x.astype(compute_dtype)
    Wb = Wp.astype(compute_dtype).reshape(Vp // chunk, chunk, E)

    def body(carry, args):
        best_s, best_i = carry
        Wc, idx0 = args
        logits = jnp.einsum("ne,ce->nc", xb, Wc, preferred_element_type=jnp.float32)
        col = idx0 + jnp.arange(chunk)
        logits = jnp.where((col < V)[None, :], logits, NEG)
        s, i = jax.lax.top_k(logits, k)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, i + idx0], axis=1)
        s2, pos = jax.lax.top_k(cat_s, k)
        i2 = jnp.take_along_axis(cat_i, pos, axis=1)
        return (s2, i2), None

    init = (jnp.full((N, k), NEG, jnp.float32), jnp.zeros((N, k), jnp.int32))
    idxs = jnp.arange(Vp // chunk) * chunk
    (scores, ids), _ = jax.lax.scan(body, init, (Wb, idxs))
    return scores, ids
