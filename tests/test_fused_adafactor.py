"""fused_adafactor must match optax.adafactor bit-closely, step for step.

The fused reformulation (ops/fused_adafactor.py) claims EXACT optax semantics
— same factoring rule, decay schedule, epsilon placement, block-rms clipping,
sign — with fewer HBM passes. These tests run multi-step updates on mixed
pytrees (large factored 2-D, small unfactored 2-D, 1-D) and require the param
trajectories to stay within float tolerance of optax.adafactor's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    return {
        "big_table": jax.random.normal(ks[0], (512, 192)) * 0.05,  # factored
        "small_table": jax.random.normal(ks[1], (300, 48)) * 0.05,  # not (48<128)
        "dense": {"kernel": jax.random.normal(ks[2], (192, 192)) * 0.02,
                  "bias": jnp.zeros((192,))},
    }


def _grads(params, step):
    k = jax.random.PRNGKey(1000 + step)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(k, len(leaves))
    return jax.tree.unflatten(
        treedef, [jax.random.normal(kk, l.shape) * 0.1 for kk, l in zip(ks, leaves)]
    )


@pytest.mark.parametrize("lr", [1e-3, 6.7e-4])
@pytest.mark.parametrize("clipping", [1.0, None])
def test_matches_optax_trajectory(lr, clipping):
    params_a = _tree()
    params_b = _tree()
    ref = optax.adafactor(learning_rate=lr, multiply_by_parameter_scale=False,
                          clipping_threshold=clipping)
    # min_dim_size_to_factor=128 aligns the factoring decision with optax's
    # default (ours never factors by default — quality, see module docstring)
    fused = fused_adafactor(learning_rate=lr, clipping_threshold=clipping,
                            min_dim_size_to_factor=128)
    sa, sb = ref.init(params_a), fused.init(params_b)

    for step in range(5):
        g = _grads(params_a, step)
        ua, sa = ref.update(g, sa, params_a)
        ub, sb = fused.update(g, sb, params_b)
        params_a = optax.apply_updates(params_a, ua)
        params_b = optax.apply_updates(params_b, ub)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=2e-5, atol=1e-7),
            params_a, params_b,
        )


def test_factoring_threshold_engages():
    """min_dim_size_to_factor=64 must factor a (V, 64) table: states are
    (64,) + (V,) vectors, not a full (V, 64) second moment."""
    params = {"item_table": jnp.ones((1000, 64)) * 0.03}
    tx = fused_adafactor(6.7e-4, min_dim_size_to_factor=64)
    state = tx.init(params)
    assert state.v_row["item_table"].shape == (64,)
    assert state.v_col["item_table"].shape == (1000,)
    assert state.v["item_table"].shape == (1,)
    # and it must equal optax.adafactor configured the same way
    ref = optax.adafactor(6.7e-4, multiply_by_parameter_scale=False,
                          min_dim_size_to_factor=64)
    ps_a, ps_b = dict(params), dict(params)
    sa, sb = ref.init(ps_a), tx.init(ps_b)
    for step in range(4):
        g = {"item_table": jax.random.normal(jax.random.PRNGKey(step),
                                             (1000, 64)) * 0.1}
        ua, sa = ref.update(g, sa, ps_a)
        ub, sb = tx.update(g, sb, ps_b)
        ps_a = optax.apply_updates(ps_a, ua)
        ps_b = optax.apply_updates(ps_b, ub)
    np.testing.assert_allclose(ps_a["item_table"], ps_b["item_table"],
                               rtol=2e-5, atol=1e-7)


def test_schedule_learning_rate():
    sched = optax.linear_schedule(1e-3, 1e-4, 10)
    params = {"t": jnp.ones((256, 256)) * 0.1}
    ref = optax.adafactor(learning_rate=sched,
                          multiply_by_parameter_scale=False)
    fused = fused_adafactor(learning_rate=sched, min_dim_size_to_factor=128)
    pa, pb = dict(params), dict(params)
    sa, sb = ref.init(pa), fused.init(pb)
    for step in range(6):
        g = {"t": jax.random.normal(jax.random.PRNGKey(step), (256, 256))}
        ua, sa = ref.update(g, sa, pa)
        ub, sb = fused.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    np.testing.assert_allclose(pa["t"], pb["t"], rtol=2e-5, atol=1e-7)


def test_pallas_table_update_matches_jnp():
    """use_pallas=True (streamed two-pass kernels; interpret mode on CPU)
    matches the jnp unfactored branch over a multi-step run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

    V, E = 4096, 64  # >= 4 * block rows -> pallas path engages
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.05)

    def run(use_pallas):
        tx = fused_adafactor(1e-2, use_pallas=use_pallas)
        p, state = p0, tx.init(p0)
        outs = []
        for i in range(4):
            g = jnp.asarray(
                np.random.default_rng(i).normal(size=(V, E)).astype(np.float32)
            )
            upd, state = jax.jit(tx.update)(g, state, p)
            p = p + upd
            outs.append(p)
        return outs

    want = run(False)
    got = run(True)
    for i, (w, g_) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w),
                                   rtol=2e-6, atol=2e-7, err_msg=f"step {i}")


def test_bf16_moment_storage():
    """moment_dtype=bf16: the second-moment state is STORED bf16 (half the
    optimizer HBM stream) while updates stay close to the f32-state
    trajectory (compute is f32 either way)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

    V, E = 512, 16
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.05)

    def run(mdt):
        tx = fused_adafactor(1e-2, moment_dtype=mdt)
        p, state = p0, tx.init(p0)
        for i in range(4):
            g = jnp.asarray(
                np.random.default_rng(i).normal(size=(V, E)).astype(np.float32)
            )
            upd, state = jax.jit(tx.update)(g, state, p)
            p = p + upd
        return p, state

    p32, _ = run(None)
    pbf, state = run(jnp.bfloat16)
    v = jax.tree.leaves(state.v)
    assert any(x.dtype == jnp.bfloat16 for x in v if x.ndim == 2)
    # bf16 second-moment rounding perturbs the rsqrt scale by ~2^-9 relative
    np.testing.assert_allclose(np.asarray(pbf), np.asarray(p32),
                               rtol=0, atol=5e-4)
