"""LSH vs flash attention at long sequence lengths on real TPU.

The Reformer claim is asymptotic: LSH attention is O(S·m·R) compute/memory
vs exact attention's O(S²). This measures where the crossover sits on this
hardware for the shipped op (ops/lsh_attention.py sorted-chunk path) against
the flash Pallas kernel (exact attention, ops/attention.py) — fwd and
fwd+bwd.

Arms per S:
  flash — flash_attention (exact), causal
  lsh   — lsh_attention sorted path (chunk 64, 2 hashes, S//64 buckets), causal

Usage: python benchmarks/lsh_long_seq_bench.py [--seqs 2048,8192] [--iters 20]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import jax
import jax.numpy as jnp

from transformers4rec_tpu.ops import attention as A
from transformers4rec_tpu.ops.lsh_attention import lsh_attention


def time_fn(fn, args, iters):
    """Chain each iteration's FIRST argument on the previous output (same
    shape/dtype) so the tunnel cannot overlap or elide executions —
    block_until_ready alone under-reports through the async tunnel — and
    force one host transfer at the end."""
    args = list(args)
    # one call is NOT enough warmup on the tunnel: the first ~10 executions
    # of a fresh executable run ~20x slow (measured); warm until stable
    for _ in range(12):
        out = fn(*args)
        args[0] = jax.tree_util.tree_leaves(out)[0]
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args[0] = jax.tree_util.tree_leaves(out)[0]
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", default="2048,4096,8192")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--hashes", type=int, default=2)
    args = p.parse_args()

    B, H, Dh = args.batch, args.heads, args.dh
    key = jax.random.PRNGKey(0)

    for S in [int(s) for s in args.seqs.split(",")]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, S, H, Dh), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
        nb = max(4, min(512, S // args.chunk))
        if nb % 2:
            nb += 1

        @jax.jit
        def flash_fwd(q, k, v):
            return A.flash_attention(q, k, v, causal=True)

        @jax.jit
        def lsh_fwd(q, v):
            return lsh_attention(
                q, v, causal=True, chunk_size=args.chunk,
                num_hashes=args.hashes, num_buckets=nb, force_sorted=True,
            )

        @jax.jit
        def flash_bwd(q, k, v):
            return jax.grad(
                lambda q, k, v: A.flash_attention(q, k, v, causal=True)
                .astype(jnp.float32).sum()
            )(q, k, v)

        @jax.jit
        def lsh_bwd(q, v):
            return jax.grad(
                lambda q, v: lsh_attention(
                    q, v, causal=True, chunk_size=args.chunk,
                    num_hashes=args.hashes, num_buckets=nb,
                    force_sorted=True,
                ).astype(jnp.float32).sum()
            )(q, v)

        rows = {
            "flash_fwd": (flash_fwd, (q, k, v)),
            "lsh_fwd": (lsh_fwd, (q, v)),
            "flash_bwd": (flash_bwd, (q, k, v)),
            "lsh_bwd": (lsh_bwd, (q, v)),
        }
        for name, (fn, a) in rows.items():
            try:
                ms = time_fn(fn, a, args.iters)
                print(f"S={S:5d} {name:10s} {ms:9.3f} ms  (buckets={nb})")
            except Exception as e:  # noqa: BLE001 — report per-arm failures
                print(f"S={S:5d} {name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
