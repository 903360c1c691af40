"""A/B the flash-attention backward paths on real TPU.

Arms per sequence length:
  xla    — reference_attention under jax.grad (materializes (B,H,S,S) probs)
  split  — fused flash fwd + split dq / dkv Pallas kernels
  fused1 — fused flash fwd + single-pass dq/dk/dv kernel (one logits recompute)

Usage: python benchmarks/attention_bwd_ab.py [--seqs 1024,2048,4096] [--iters 30]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import jax
import jax.numpy as jnp

from transformers4rec_tpu.ops import attention as A


def time_fn(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force a real transfer so async dispatch can't under-report
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", default="1024,2048,4096,8192")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dh", type=int, default=64)
    args = p.parse_args()

    B, H, Dh = args.batch, args.heads, args.dh
    key = jax.random.PRNGKey(0)

    for S in [int(s) for s in args.seqs.split(",")]:
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (B, S, H, Dh), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
        g = jax.random.normal(ks[3], (B, S, H, Dh), jnp.bfloat16)

        bq = min(512, S)
        bk = min(1024, S)

        def make(arm):
            @jax.jit
            def f(q, k, v, g):
                if arm == "xla":
                    _, vjp = jax.vjp(
                        lambda q_, k_, v_: A.reference_attention(
                            q_, k_, v_, causal=True), q, k, v)
                else:
                    _, vjp = jax.vjp(
                        lambda q_, k_, v_: A.flash_attention(
                            q_, k_, v_, causal=True,
                            block_q=bq, block_k=bk), q, k, v)
                return vjp(g)
            return f

        results = {}
        for arm in ("xla", "split", "fused1"):
            if arm == "xla" and S > 4096:
                # XLA's materialized bwd OOMs/fails at long S
                try:
                    A.FUSED_BWD_MIN_SEQ = 10 ** 9
                    results[arm] = time_fn(make(arm), (q, k, v, g), max(3, args.iters // 3))
                except Exception as e:  # noqa: BLE001
                    results[arm] = float("nan")
                    print(f"  S={S} xla failed: {type(e).__name__}")
                continue
            saved = A._BWD_DQ_SCRATCH_MAX_BYTES
            A.FUSED_BWD_MIN_SEQ = 0  # force kernel path for split/fused1
            if arm == "split":
                A._BWD_DQ_SCRATCH_MAX_BYTES = 0
            elif arm == "fused1":
                A._BWD_DQ_SCRATCH_MAX_BYTES = 64 << 20
            try:
                results[arm] = time_fn(make(arm), (q, k, v, g), args.iters)
            except Exception as e:  # noqa: BLE001
                results[arm] = float("nan")
                print(f"  S={S} {arm} failed: {type(e).__name__}: {e}")
            finally:
                A._BWD_DQ_SCRATCH_MAX_BYTES = saved
                A.FUSED_BWD_MIN_SEQ = 4096
        print(f"S={S:5d}  " + "  ".join(
            f"{k}={v:7.2f}ms" for k, v in results.items()))


if __name__ == "__main__":
    main()
