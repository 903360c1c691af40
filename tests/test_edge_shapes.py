"""Edge-shape hardening: tiny batches, minimal sessions, tiny vocabularies.

Padding/budget/gather logic is where off-by-ones live (block padding in
ops/vocab.py, the MLM [MASK] extension, eval single-target gathers, the
adaptive loss budget). Run every mode at shapes far below the block sizes.
"""

import jax
import jax.numpy as jnp
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data.synthetic import (
    synthetic_data,
    synthetic_ecommerce_data_schema,
)


def _rngs():
    return {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }


def _build(masking, arch, num_items=37, seq=4, d=8, heads=2):
    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=5, max_session_length=seq
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=d, masking=masking, aggregation="concat"
    )
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=d, n_head=heads, n_layer=1, total_seq_length=seq
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    return schema, model


@pytest.mark.parametrize("masking,arch", [
    ("clm", "gpt2"), ("mlm", "xlnet"), ("plm", "xlnet"), ("rtd", "electra"),
])
@pytest.mark.parametrize("batch", [1, 3])
def test_tiny_shapes_all_modes(masking, arch, batch):
    schema, model = _build(masking, arch)
    data = synthetic_data(schema, num_rows=batch, max_session_length=4, seed=0)
    b = {k: jnp.asarray(v) for k, v in data.items()}
    params = model.init(_rngs(), b, training=True)

    # train: finite loss with gradients
    def loss_fn(p):
        loss, _ = model.apply(p, b, training=True,
                              rngs={k: v for k, v in _rngs().items() if k != "params"})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))

    # eval: finite loss, metric states well-formed
    eloss, outs = model.apply(params, b, targets=b, testing=True,
                              compute_metrics=True)
    assert jnp.isfinite(eloss)
    for name, (s, c) in outs["next-item"].metrics.items():
        assert jnp.isfinite(s) and c >= 0, name

    # inference: top-k bounded by the true vocab — cardinality is
    # num_items + 1 (ids 1..num_items plus padding id 0, reference
    # int_domain.max + 1 semantics); table shard-padding rows are excluded
    scores, ids = model.apply(params, b, top_k=5)
    assert scores.shape == (batch, 5) and ids.shape == (batch, 5)
    assert int(ids.max()) <= 37


def test_vocab_smaller_than_topk_chunk():
    """Vocab far below the CE/topk block sizes must still work (block padding
    handles V < block_v and k close to V)."""
    schema, model = _build("clm", "gpt2", num_items=12)
    data = synthetic_data(schema, num_rows=2, max_session_length=4, seed=1)
    b = {k: jnp.asarray(v) for k, v in data.items()}
    params = model.init(_rngs(), b, training=True)
    scores, ids = model.apply(params, b, top_k=11)
    assert ids.shape == (2, 11)
    assert int(ids.max()) <= 12  # cardinality 13: ids 0..12
    assert len(set(map(int, ids[0]))) == 11  # no duplicate padded columns


def test_single_item_sessions_mlm():
    """Sessions of length 1-2 must satisfy the MLM >=1-masked guarantee
    without NaNs (the reference guards this — masking.py:426-459)."""
    schema, model = _build("mlm", "xlnet", seq=2)
    data = synthetic_data(schema, num_rows=4, max_session_length=2, seed=2)
    b = {k: jnp.asarray(v) for k, v in data.items()}
    params = model.init(_rngs(), b, training=True)
    loss, _ = model.apply(params, b, training=True,
                          rngs={k: v for k, v in _rngs().items() if k != "params"})
    assert jnp.isfinite(loss)
