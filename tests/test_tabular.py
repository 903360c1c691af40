import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformers4rec_tpu.tabular import (
    ConcatFeatures,
    ElementwiseSum,
    ElementwiseSumItemMulti,
    FilterFeatures,
    StackFeatures,
    StochasticSwapNoise,
    TabularDropout,
    TabularLayerNorm,
    tabular_aggregation_registry,
)
from transformers4rec_tpu.schema import ColumnSchema, Schema, Tags


def _inputs():
    return {
        "a": jnp.ones((4, 10, 8)),
        "b": jnp.full((4, 10, 8), 2.0),
    }


def test_concat_sorted_order():
    x = {"b": jnp.full((4, 10, 2), 2.0), "a": jnp.ones((4, 10, 3))}
    out = ConcatFeatures()(x)
    assert out.shape == (4, 10, 5)
    # sorted-key order: 'a' first
    assert float(out[0, 0, 0]) == 1.0
    assert float(out[0, 0, 3]) == 2.0


def test_stack_and_esum():
    out = StackFeatures()(_inputs())
    assert out.shape == (4, 10, 8, 2)
    out = ElementwiseSum()(_inputs())
    assert out.shape == (4, 10, 8)
    assert float(out[0, 0, 0]) == 3.0


def test_esum_item_multi():
    schema = Schema([ColumnSchema.create_categorical("a", 10, tags=[Tags.ITEM_ID])])
    agg = ElementwiseSumItemMulti(schema=schema)
    out = agg(_inputs())
    assert out.shape == (4, 10, 8)
    assert float(out[0, 0, 0]) == 2.0  # item(1) * other(2)


def test_expand_non_sequential():
    x = {"seq": jnp.ones((4, 10, 8)), "ctx": jnp.full((4, 8), 3.0)}
    out = ConcatFeatures()(x)
    assert out.shape == (4, 10, 16)
    assert float(out[0, 5, 4]) == 3.0  # ctx (sorted first) broadcast over seq positions


def test_elementwise_dim_mismatch_raises():
    x = {"a": jnp.ones((4, 10, 8)), "b": jnp.ones((4, 10, 4))}
    with pytest.raises(ValueError, match="equal last dims"):
        ElementwiseSum()(x)


def test_filter_features():
    x = _inputs()
    assert set(FilterFeatures(["a"])(x)) == {"a"}
    assert set(FilterFeatures(["a"], exclude=True)(x)) == {"b"}


def test_registry():
    assert tabular_aggregation_registry.parse("concat") is ConcatFeatures
    assert tabular_aggregation_registry.parse("element-wise-sum") is ElementwiseSum


def test_layer_norm_params():
    ln = TabularLayerNorm()
    x = {"a": jnp.ones((4, 10, 8)), "ids": jnp.ones((4, 10), jnp.int32)}
    params = ln.init(jax.random.PRNGKey(0), x)
    out = ln.apply(params, x)
    assert out["a"].shape == (4, 10, 8)
    assert out["ids"].dtype == jnp.int32  # non-float passthrough
    assert "ln_a" in params["params"]


def test_dropout_train_vs_eval():
    do = TabularDropout(dropout_rate=0.5)
    x = {"a": jnp.ones((4, 10, 8))}
    out_eval = do.apply({}, x, training=False)
    np.testing.assert_allclose(out_eval["a"], x["a"])
    out_train = do.apply({}, x, training=True, rngs={"dropout": jax.random.PRNGKey(0)})
    assert float(out_train["a"].min()) == 0.0  # some dropped
    assert float(out_train["a"].max()) == 2.0  # scaled by 1/keep


def test_stochastic_swap_noise():
    ssn = StochasticSwapNoise(replacement_prob=0.5)
    ids = jnp.tile(jnp.arange(1, 21)[None, :], (8, 1))  # distinct per column
    mask = ids > 10  # only second half non-"pad"
    x = {"f": ids.astype(jnp.float32)}
    out = ssn.apply({}, x, training=True, pad_mask=mask,
                    rngs={"augment": jax.random.PRNGKey(0)})["f"]
    changed = out != x["f"]
    assert changed.any()  # some swapped
    assert not changed[~mask].any()  # pad positions untouched
    # replacement values must come from non-pad pool (>10)
    assert float(out[changed].min()) > 10
    # eval mode: identity
    out_eval = ssn.apply({}, x, training=False, pad_mask=mask)["f"]
    np.testing.assert_allclose(out_eval, x["f"])


def test_stochastic_swap_noise_skips_reserved_keys():
    """segment_ids (session-packing structure) and dunder side channels
    (__neg_ids__) must pass through SSN untouched — swap-noising them would
    corrupt block-diagonal attention / the sampled-softmax logQ pairing."""
    ssn = StochasticSwapNoise(replacement_prob=1.0)
    seg = jnp.tile(jnp.arange(1, 11)[None, :], (4, 1))
    neg = jnp.arange(1, 65)
    feat = jnp.tile(jnp.arange(1, 11)[None, :], (4, 1)).astype(jnp.float32)
    x = {"f": feat, "segment_ids": seg, "__neg_ids__": neg}
    out = ssn.apply({}, x, training=True,
                    rngs={"augment": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(out["segment_ids"], seg)
    np.testing.assert_array_equal(out["__neg_ids__"], neg)
    assert (out["f"] != feat).any()  # the real feature WAS noised
