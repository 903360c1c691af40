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


def test_from_schema_pretrained_embeddings_routes(ecommerce_schema, yoochoose_like_batch):
    """from_schema wires pretrained embeddings (reference tabular.py:125-190):
    (a) explicit {col: matrix} tables looked up in-model, (b) Tags.EMBEDDING
    columns whose batch values are precomputed vectors."""
    import numpy as onp

    from transformers4rec_tpu.schema import ColumnSchema, Tags

    # (a) explicit table for item_id alongside the learned embeddings
    pre = onp.random.default_rng(0).normal(size=(1001, 12)).astype(onp.float32)
    mod = TabularSequenceFeatures.from_schema(
        ecommerce_schema,
        d_output=32,
        masking="clm",
        pretrained_embeddings={"item_id": pre},
        pretrained_projection_dim=8,
    )
    batch = _jax_batch(yoochoose_like_batch)
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, training=True,
    )
    out, info = mod.apply(
        params, batch, training=True, rngs={"masking": jax.random.PRNGKey(1)}
    )
    assert out.shape[-1] == 32
    # the pretrained lookup contributes params (projection) and runs
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("pretrained" in jax.tree_util.keystr(p) for p, _ in flat)

    # (b) a Tags.EMBEDDING column: the batch carries (B, S, D) vectors
    emb_col = ColumnSchema.create_continuous("txt_emb", tags=[Tags.EMBEDDING])
    schema2 = ecommerce_schema + type(ecommerce_schema)([emb_col])
    mod2 = TabularSequenceFeatures.from_schema(
        schema2, d_output=32, masking="clm", pretrained_output_dims={"txt_emb": 6},
    )
    batch2 = dict(batch)
    batch2["txt_emb"] = jnp.asarray(
        onp.random.default_rng(1).normal(size=(batch["item_id"].shape[0], 20, 6)),
        jnp.float32,
    )
    params2 = mod2.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch2, training=True,
    )
    out2, info2 = mod2.apply(
        params2, batch2, training=True, rngs={"masking": jax.random.PRNGKey(1)}
    )
    assert out2.shape[-1] == 32
    assert jnp.isfinite(out2).all()


def test_precomputed_mean_combiner_ignores_padding():
    """sequence_combiner='mean' over a precomputed-vector column divides by
    the count of REAL (nonzero-vector) positions, not the full length S."""
    from transformers4rec_tpu.features.embedding import PretrainedEmbeddingFeatures

    mod = PretrainedEmbeddingFeatures(
        precomputed_features=("v",), precomputed_dims={"v": 2},
        sequence_combiner="mean",
    )
    emb = np.zeros((1, 4, 2), np.float32)
    emb[0, 0] = [2.0, 4.0]
    emb[0, 1] = [4.0, 0.0]  # positions 2,3 are padding (zero vectors)
    out = mod.apply({}, {"v": jnp.asarray(emb)})
    np.testing.assert_allclose(np.asarray(out["v"][0]), [3.0, 2.0])

    # undeclared dim raises at sizing time instead of returning 0
    bad = PretrainedEmbeddingFeatures(precomputed_features=("v",))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pretrained_output_dims"):
        bad.feature_sizes()


def test_embedding_custom_initializer_applies():
    """Custom per-column initializers land in the created tables (reference
    test_embedding_features_custom_init / _yoochoose_custom_initializers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=50, num_categories=10, max_session_length=5
    )
    item_col = schema.item_id_column_name
    const = lambda key, shape, dtype=jnp.float32: jnp.full(shape, 0.25, dtype)
    feats = tr.EmbeddingFeatures.from_schema(
        schema, embeddings_initializers={item_col: const}
    )
    data = synthetic_data(schema, num_rows=4, max_session_length=5, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    params = feats.init(jax.random.PRNGKey(0), batch)
    table = jax.tree_util.tree_leaves_with_path(params)
    vals = [leaf for p, leaf in table
            if f"{item_col}_table" in jax.tree_util.keystr(p)]
    assert vals and np.allclose(np.asarray(vals[0]), 0.25)


def test_pretrained_initializer_composes_with_vocab_padding():
    """PretrainedEmbeddingsInitializer must tolerate the vocab-row padding
    setup() applies (rows rounded to vocab_padding_multiple): extra rows are
    zero-filled; trainable=False freezes the table via stop_gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    # cardinality NOT divisible by the padding multiple (the common case)
    schema = synthetic_ecommerce_data_schema(
        num_items=9, num_categories=5, max_session_length=4
    )
    item = schema.item_id_column_name
    card = schema.categorical_cardinalities()[item]
    assert card % 8 != 0
    w = np.random.default_rng(0).normal(size=(card, 16)).astype(np.float32)

    feats = tr.SequenceEmbeddingFeatures.from_schema(
        schema,
        embedding_dims={item: 16},
        embeddings_initializers={
            item: tr.PretrainedEmbeddingsInitializer(w, trainable=False)
        },
    )
    data = synthetic_data(schema, num_rows=4, max_session_length=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    params = feats.init(jax.random.PRNGKey(0), batch)
    table = [
        leaf for p, leaf in jax.tree_util.tree_leaves_with_path(params)
        if f"{item}_table" in jax.tree_util.keystr(p)
    ][0]
    assert table.shape[0] % 8 == 0 and table.shape[0] >= card
    np.testing.assert_allclose(np.asarray(table)[:card], w)  # rows preserved
    assert np.all(np.asarray(table)[card:] == 0.0)           # padding zeroed

    # trainable=False: no gradient reaches the frozen table
    def loss(p):
        out = feats.apply(p, batch)
        return sum(jnp.sum(v ** 2) for v in out.values())

    grads = jax.grad(loss)(params)
    gtab = [
        leaf for p, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if f"{item}_table" in jax.tree_util.keystr(p)
    ][0]
    assert float(jnp.abs(gtab).max()) == 0.0


def test_nonzero_padding_idx_honored_in_lookup():
    """padding_idx=2: the embedding layer zeroes id-2 rows (not id 0) and the
    mean combiner counts only non-pad positions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=20, num_categories=5, max_session_length=4
    )
    item = schema.item_id_column_name
    feats = tr.SequenceEmbeddingFeatures.from_schema(
        schema, embedding_dims={item: 8}, padding_idx=2
    )
    assert feats.padding_idx == 2
    ids = jnp.asarray([[3, 4, 2, 2]])
    batch = {item: ids, "category": jnp.asarray([[1, 1, 0, 0]])}
    params = feats.init(jax.random.PRNGKey(0), batch)
    out = feats.apply(params, batch)[item]
    assert np.all(np.asarray(out)[0, 2:] == 0.0)   # pad id 2 zeroed
    assert np.abs(np.asarray(out)[0, 0]).max() > 0  # real ids live
