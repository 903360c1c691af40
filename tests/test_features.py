import jax
import jax.numpy as jnp
import numpy as np

from transformers4rec_tpu.features import (
    ContinuousFeatures,
    EmbeddingFeatures,
    PretrainedEmbeddingFeatures,
    SequenceEmbeddingFeatures,
    SoftEmbeddingFeatures,
    TabularSequenceFeatures,
)


def _jax_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_continuous_features(ecommerce_schema, yoochoose_like_batch):
    mod = ContinuousFeatures.from_schema(ecommerce_schema)
    out = mod.apply({}, _jax_batch(yoochoose_like_batch))
    assert set(out) == {"item_recency", "weekday_sin"}
    assert out["item_recency"].shape == (100, 20, 1)


def test_sequence_embedding_features(ecommerce_schema, yoochoose_like_batch):
    mod = SequenceEmbeddingFeatures.from_schema(
        ecommerce_schema, embedding_dim_default=16
    )
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(params, batch)
    assert out["item_id"].shape == (100, 20, 16)
    assert out["category"].shape == (100, 20, 16)
    # pad positions (id 0) have zero embeddings
    pad = np.asarray(batch["item_id"]) == 0
    assert np.abs(np.asarray(out["item_id"])[pad]).max() == 0.0
    assert mod.item_id == "item_id"
    assert mod.feature_sizes() == {"item_id": 16, "category": 16}


def test_embedding_mean_combiner(ecommerce_schema, yoochoose_like_batch):
    mod = EmbeddingFeatures.from_schema(ecommerce_schema, embedding_dim_default=8)
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(params, batch)
    # 2-D ids mean-combined to (B, dim) — the EmbeddingBag path
    assert out["item_id"].shape == (100, 8)


def test_embedding_dim_inference(ecommerce_schema):
    mod = EmbeddingFeatures.from_schema(
        ecommerce_schema, infer_embedding_sizes=True, infer_embedding_sizes_multiplier=2.0
    )
    # card 1001 -> ceil(1001^0.25 * 2) = 12 ; card 51 -> ceil(51^0.25*2) = 6
    assert mod.feature_configs["item_id"].table.dim == 12
    assert mod.feature_configs["category"].table.dim == 6


def test_soft_embedding_features(ecommerce_schema, yoochoose_like_batch):
    mod = SoftEmbeddingFeatures.from_schema(
        ecommerce_schema, soft_embedding_dim_default=8, soft_embedding_cardinality_default=5
    )
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(params, batch)
    assert out["item_recency"].shape == (100, 20, 8)


def test_pretrained_embedding_features(yoochoose_like_batch):
    pre = np.random.default_rng(0).normal(size=(1001, 12)).astype(np.float32)
    mod = PretrainedEmbeddingFeatures(
        pretrained_embeddings={"item_id": pre}, projection_dim=6
    )
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(params, batch)
    assert out["item_id"].shape == (100, 20, 6)


def test_tabular_sequence_features_from_schema(ecommerce_schema, yoochoose_like_batch):
    mod = TabularSequenceFeatures.from_schema(
        ecommerce_schema,
        max_sequence_length=20,
        d_output=32,
        masking="mlm",
        embedding_dim_default=16,
    )
    batch = _jax_batch(yoochoose_like_batch)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, training=True,
    )
    hidden, info = mod.apply(
        variables, batch, training=True, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert hidden.shape == (100, 20, 32)
    assert info is not None
    assert info.targets.shape == (100, 20)
    assert mod.output_size() == 32
    assert mod.masking_enabled


def test_tsf_continuous_projection(ecommerce_schema, yoochoose_like_batch):
    mod = TabularSequenceFeatures.from_schema(
        ecommerce_schema,
        d_output=24,
        masking="clm",
        continuous_projection=8,
        embedding_dim_default=16,
    )
    batch = _jax_batch(yoochoose_like_batch)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, training=True,
    )
    hidden, info = mod.apply(
        variables, batch, training=True, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert hidden.shape == (100, 20, 24)
    # concat sizes: 2 cat * 16 + continuous_projection 8 = 40
    assert mod.clone(projection_dims=None, masking=None).output_size() == 40


def test_tsf_no_masking_no_projection(ecommerce_schema, yoochoose_like_batch):
    mod = TabularSequenceFeatures.from_schema(
        ecommerce_schema, aggregation="concat", embedding_dim_default=16
    )
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(jax.random.PRNGKey(0), batch)
    hidden, info = mod.apply(params, batch)
    assert info is None
    assert hidden.shape == (100, 20, 34)  # 16+16+1+1
    assert mod.output_size() == 34
