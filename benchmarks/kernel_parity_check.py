"""On-device Pallas-vs-fallback parity sweep for EVERY hot kernel.

The CI suite runs on CPU where the ops dispatch to their lax.scan/jnp
fallbacks; this script is the on-TPU complement: it runs each Pallas kernel
AND its fallback on the real chip and asserts numeric agreement (values and
gradients). Run after touching anything in ops/ —

    python benchmarks/kernel_parity_check.py            # REES46-ish shapes
    python benchmarks/kernel_parity_check.py --quick    # tiny shapes

Prints one PASS/FAIL line per check and exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformers4rec_tpu.ops import (
        flash_attention,
        fused_ce_and_rank,
        fused_label_rank,
        fused_softmax_ce,
        fused_topk,
        reference_attention,
    )

    assert jax.devices()[0].platform == "tpu", (
        f"this script checks Pallas kernels on-device; got "
        f"{jax.devices()[0].platform}"
    )

    if args.quick:
        N, V, E = 128, 4096, 32
        B, S, H, Dh = 2, 256, 2, 32
    else:
        N, V, E = 1792, 390_000, 64
        B, S, H, Dh = 4, 1024, 4, 48

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, E), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(1), (V, E), jnp.float32) * 0.05
    labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, V)
    weights = (jax.random.uniform(jax.random.PRNGKey(3), (N,)) > 0.3).astype(
        jnp.float32
    )

    failures = []

    def check(name, a, b, rtol=2e-4, atol=1e-5, exact=False):
        a, b = np.asarray(a), np.asarray(b)
        try:
            if exact:
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
            print(f"PASS {name}")
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL {name}: {str(e).splitlines()[3][:120]}")

    # ------------------------------------------------------------- fused CE
    for eps in (0.0, 0.1):
        lp = fused_softmax_ce(x, W, labels, weights, 256, 4096, True, None, eps)
        ls = fused_softmax_ce(x, W, labels, weights, 256, 4096, False, None, eps)
        check(f"fused_softmax_ce value eps={eps}", lp, ls, rtol=1e-4)
        gp = jax.grad(
            lambda a, b: fused_softmax_ce(a, b, labels, weights, 256, 4096,
                                          True, None, eps), argnums=(0, 1)
        )(x, W)
        gs = jax.grad(
            lambda a, b: fused_softmax_ce(a, b, labels, weights, 256, 4096,
                                          False, None, eps), argnums=(0, 1)
        )(x, W)
        check(f"fused_softmax_ce dx eps={eps}", gp[0], gs[0], rtol=1e-3,
              atol=1e-5)
        check(f"fused_softmax_ce dW eps={eps}", gp[1], gs[1], rtol=1e-3,
              atol=1e-5)

    # --------------------------------------------------------- CE+rank eval
    for eps in (0.0, 0.2):
        lp, rp = fused_ce_and_rank(x, W, labels, weights, 256, 4096, True,
                                   None, eps)
        ls, rs = fused_ce_and_rank(x, W, labels, weights, 256, 4096, False,
                                   None, eps)
        check(f"fused_ce_and_rank loss eps={eps}", lp, ls, rtol=1e-4)
        check(f"fused_ce_and_rank rank eps={eps}", rp, rs, exact=True)

    # ------------------------------------------------------------ label rank
    rp = fused_label_rank(x, W, labels, 256, 4096, True)
    rs = fused_label_rank(x, W, labels, 256, 4096, False)
    check("fused_label_rank", rp, rs, exact=True)

    # ---------------------------------------------------------------- top-k
    sp, ip = fused_topk(x, W, 20)
    dense = jnp.einsum("ne,ve->nv", x.astype(jnp.bfloat16),
                       W.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    sd, idd = jax.lax.top_k(dense, 20)
    check("fused_topk ids", ip, idd, exact=True)
    check("fused_topk scores", sp, sd, rtol=1e-5)

    # ------------------------------------------------------ flash attention
    q = jax.random.normal(jax.random.PRNGKey(4), (B, S, H, Dh), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(5), (B, S, H, Dh), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(6), (B, S, H, Dh), jnp.float32)
    pad = jnp.arange(S)[None, :] < (S - 7)
    pad = jnp.broadcast_to(pad, (B, S))
    def check_normwise(name, a, b, tol=2e-2):
        # bf16 MXU tiles vs the reference's own accumulation order: elementwise
        # tolerances misfire on early causal rows (2-3 attended keys, tiny
        # magnitudes); relative L2 is the right lens
        na = float(jnp.linalg.norm(a - b) / jnp.maximum(jnp.linalg.norm(b), 1e-6))
        if na < tol:
            print(f"PASS {name} (relerr {na:.1e})")
        else:
            failures.append(name)
            print(f"FAIL {name}: relerr {na:.3e}")

    for causal in (False, True):
        of = flash_attention(q, k, v, pad_mask=pad, causal=causal)
        orf = reference_attention(q, k, v, pad_mask=pad, causal=causal)
        check_normwise(f"flash fwd causal={causal}", of, orf)

        def loss_f(q_, k_, v_):
            return (flash_attention(q_, k_, v_, pad_mask=pad,
                                    causal=causal) ** 2).sum()

        def loss_r(q_, k_, v_):
            return (reference_attention(q_, k_, v_, pad_mask=pad,
                                        causal=causal) ** 2).sum()

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for nm, a, b in zip("qkv", gf, gr):
            # normwise: bf16 MXU tiles vs f32 reference
            na = float(jnp.linalg.norm(a - b) / jnp.maximum(
                jnp.linalg.norm(b), 1e-6))
            if na < 2e-2:
                print(f"PASS flash bwd d{nm} causal={causal} (relerr {na:.1e})")
            else:
                failures.append(f"flash bwd d{nm} causal={causal}")
                print(f"FAIL flash bwd d{nm} causal={causal}: relerr {na:.3e}")

    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
