"""LSH (locality-sensitive-hashing) attention — Reformer's long-sequence op.

Parity: the reference's ReformerConfig builds HF Reformer bodies with
``attn_layers=["local", "lsh"] * (n_layer // 2)``
(/root/reference/transformers4rec/config/transformer.py:185-206); the LSH
layers are HF ``LSHSelfAttention`` (Kitaev et al., "Reformer: The Efficient
Transformer"). Re-designed TPU-first rather than ported:

- **Everything is static-shape under jit.** Bucketing is realized as ONE
  stable ``argsort`` of ``bucket·S + position`` per hash round (XLA sorts are
  fast and fully shaped), followed by a reshape into ``(chunks, m)`` — no
  data-dependent gather sizes, no host round-trips.
- **Chunked attention is a batched small GEMM** ``(m, 2m)·(2m, Dh)`` over
  ``B·H·rounds·chunks`` — MXU-friendly, O(S·m) memory instead of O(S²).
- **Angular LSH**: hash of x = argmax over ``[xR, -xR]`` with a fixed random
  rotation R (Dh, rounds, buckets/2). Rotations are deterministic constants
  derived from a seed (never trained) — reproducible under jit; the paper
  draws fresh rotations per forward, which only matters for its variance
  analysis, not capability.
- **Shared-QK with length-normalized keys** (the Reformer formulation:
  k_j = qk_j / ||qk_j||; queries unnormalized; logits scaled by Dh^-1/2).
  Self-attention gets a FINITE penalty (``SELF_PENALTY``) instead of -inf so
  a query whose bucket contains nothing else still returns its own value —
  same policy as HF's ``self_mask_value``.
- Each query attends its own chunk plus the previous chunk (circular in
  sorted order), per hash round; rounds are combined with softmax weights
  over the per-round logsumexp (the paper's multi-round estimator).

Dispatch policy mirrors ``ops/attention.py``: sessions in this domain are
short (S≈20 — SURVEY.md §5), where the O(S²) dense form of the SAME
shared-QK semantics (``lsh_reference``) is exact and cheaper than sorting;
the sorted-chunk approximation engages at ``S >= LSH_MIN_SEQ``.

Scope guards (enforced by the encoder): no perm-mask / two-stream, no
session packing, no mem_len, no relative-position bias on LSH layers —
these all require arbitrary pairwise masks or biases that do not survive
bucket-sorted chunking. Reformer's shipped config (MLM, axial absolute
positions) needs none of them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e9
# finite self-attention penalty: self is dominated by any other in-bucket key
# but remains the fallback target when a query is alone in its bucket
SELF_PENALTY = -1e5
# below this sequence length the exact dense form is used (sorting overhead
# dominates and the approximation buys nothing)
LSH_MIN_SEQ = 64


def _normalize_keys(qk: jnp.ndarray) -> jnp.ndarray:
    return qk / jnp.maximum(
        jnp.linalg.norm(qk.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
    ).astype(qk.dtype)


def _hash_buckets(
    k_normed: jnp.ndarray, num_buckets: int, num_hashes: int, seed: int
) -> jnp.ndarray:
    """Angular LSH buckets. k_normed: (B, S, H, Dh) → (B, S, H, R) int32 in
    [0, num_buckets). Rotations are a deterministic constant of ``seed``."""
    if num_buckets % 2:
        raise ValueError(f"num_buckets must be even, got {num_buckets}")
    Dh = k_normed.shape[-1]
    rot = jax.random.normal(
        jax.random.PRNGKey(seed), (Dh, num_hashes, num_buckets // 2),
        dtype=jnp.float32,
    )
    proj = jnp.einsum(
        "bshd,drn->bshrn", k_normed.astype(jnp.float32), rot,
        preferred_element_type=jnp.float32,
    )
    return jnp.argmax(
        jnp.concatenate([proj, -proj], axis=-1), axis=-1
    ).astype(jnp.int32)


def lsh_reference(
    qk: jnp.ndarray,
    v: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Exact O(S²) dense attention with LSH-attention SEMANTICS (shared QK,
    length-normalized keys, finite self penalty). This is what the sorted
    path converges to as chunks cover the sequence — the numerics oracle in
    tests AND the live short-S path (every bucket decision is then moot:
    dense attention attends everything the approximation could)."""
    B, S, H, Dh = qk.shape
    k = _normalize_keys(qk)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qk, k, preferred_element_type=jnp.float32
    ) * (Dh ** -0.5)
    idx = jnp.arange(S)
    self_block = (idx[None, :] == idx[:, None])[None, None]
    logits = logits + jnp.where(self_block, SELF_PENALTY, 0.0)
    if causal:
        logits = logits + jnp.where(
            idx[None, :] > idx[:, None], NEG, 0.0
        )[None, None]
    if pad_mask is not None:
        logits = logits + jnp.where(pad_mask[:, None, None, :], 0.0, NEG)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    )
    if pad_mask is not None:  # pad queries emit zeros
        out = out * pad_mask[:, :, None, None].astype(out.dtype)
    return out.astype(v.dtype)


def lsh_attention(
    qk: jnp.ndarray,
    v: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    num_buckets: int = 8,
    num_hashes: int = 2,
    chunk_size: int = 8,
    seed: int = 0,
    force_sorted: bool = False,
) -> jnp.ndarray:
    """LSH attention over (B, S, H, Dh) shared query/key + value tensors.

    Returns (B, S, H, Dh) context. See module docstring for the algorithm;
    ``force_sorted`` pins the sorted-chunk path for tests."""
    B, S, H, Dh = qk.shape
    if not force_sorted and S < LSH_MIN_SEQ:
        return lsh_reference(qk, v, pad_mask=pad_mask, causal=causal)

    m = int(chunk_size)
    Sp = -(-S // m) * m
    valid = (
        pad_mask if pad_mask is not None else jnp.ones((B, S), bool)
    )
    if Sp != S:
        pad_n = Sp - S
        qk = jnp.pad(qk, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_n)))
    C = Sp // m

    k = _normalize_keys(qk)
    buckets = _hash_buckets(k, num_buckets, num_hashes, seed)  # (B,Sp,H,R)
    # invalid positions sort to the very end (bucket num_buckets)
    buckets = jnp.where(valid[:, :, None, None], buckets, num_buckets)

    # (B, H, R, Sp) layout for the per-round sorts
    pos = jnp.arange(Sp, dtype=jnp.int32)
    sort_key = jnp.transpose(buckets, (0, 2, 3, 1)) * Sp + pos
    sidx = jnp.argsort(sort_key, axis=-1)  # stable: position order in bucket

    def gather_rounds(x):  # (B, Sp, H, Dh) → (B, H, R, Sp, Dh)
        xb = jnp.broadcast_to(
            jnp.transpose(x, (0, 2, 1, 3))[:, :, None],
            (B, H, num_hashes, Sp, x.shape[-1]),
        )
        return jnp.take_along_axis(xb, sidx[..., None], axis=3)

    qs = gather_rounds(qk)
    ks = gather_rounds(k)
    vs = gather_rounds(v)
    pos_s = jnp.take_along_axis(
        jnp.broadcast_to(pos[None, None, None], (B, H, num_hashes, Sp)), sidx,
        axis=-1,
    )
    valid_s = jnp.take_along_axis(
        jnp.broadcast_to(valid[:, None, None], (B, H, num_hashes, Sp)), sidx,
        axis=-1,
    )

    def chunk(x):  # (..., Sp, d) → (..., C, m, d)
        return x.reshape(*x.shape[:-2], C, m, x.shape[-1])

    def chunk1(x):  # (..., Sp) → (..., C, m)
        return x.reshape(*x.shape[:-1], C, m)

    qs, ks, vs = chunk(qs), chunk(ks), chunk(vs)
    pos_c, valid_c = chunk1(pos_s), chunk1(valid_s)

    def with_prev(x):  # keys: own chunk ++ previous chunk (circular)
        return jnp.concatenate([x, jnp.roll(x, 1, axis=-3)], axis=-2)

    def with_prev1(x):
        return jnp.concatenate([x, jnp.roll(x, 1, axis=-2)], axis=-1)

    k_ext, v_ext = with_prev(ks), with_prev(vs)
    kpos, kvalid = with_prev1(pos_c), with_prev1(valid_c)

    logits = jnp.einsum(
        "bhrcmd,bhrcnd->bhrcmn", qs, k_ext, preferred_element_type=jnp.float32
    ) * (Dh ** -0.5)
    qpos = pos_c[..., :, None]  # (B,H,R,C,m,1)
    kpos = kpos[..., None, :]  # (B,H,R,C,1,2m)
    logits = logits + jnp.where(qpos == kpos, SELF_PENALTY, 0.0)
    if causal:
        logits = logits + jnp.where(kpos > qpos, NEG, 0.0)
    logits = logits + jnp.where(kvalid[..., None, :], 0.0, NEG)

    lse = jax.nn.logsumexp(logits, axis=-1)  # (B,H,R,C,m)
    # softmax (max-subtracted) rather than exp(logits - lse): the self
    # penalty puts rows at the -1e5 scale where f32 quantization of the
    # lse subtraction costs ~0.2% probability mass; max-subtraction is exact
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum(
        "bhrcmn,bhrcnd->bhrcmd", probs, v_ext,
        preferred_element_type=jnp.float32,
    )

    # unsort back to original positions
    inv = jnp.argsort(sidx, axis=-1)
    o_flat = o.reshape(B, H, num_hashes, Sp, Dh)
    lse_flat = lse.reshape(B, H, num_hashes, Sp)
    o_orig = jnp.take_along_axis(o_flat, inv[..., None], axis=3)
    lse_orig = jnp.take_along_axis(lse_flat, inv, axis=3)

    # multi-round combination: softmax over rounds of the per-round lse
    w = jax.nn.softmax(lse_orig, axis=2)[..., None]  # (B,H,R,Sp,1)
    out = jnp.sum(o_orig * w, axis=2)  # (B,H,Sp,Dh)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :S]  # (B,S,H,Dh)
    out = out * valid[:, :S, None, None].astype(out.dtype)
    return out.astype(v.dtype)
