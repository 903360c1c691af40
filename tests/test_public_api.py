"""Public-API surface lock (reference tests/unit/torch/test_public_api.py)."""

import numpy as np
import pytest

import transformers4rec_tpu as tr

# The reference's ``transformers4rec.torch.__all__`` (54 names,
# torch/__init__.py:100-155). Every one must resolve at our top level so a
# reference user's imports keep working.
REFERENCE_TORCH_ALL = [
    "AlbertConfig", "AsTabular", "BinaryClassificationTask", "Block",
    "BlockBase", "ConcatFeatures", "ContinuousFeatures", "ElectraConfig",
    "ElementwiseSum", "ElementwiseSumItemMulti", "EmbeddingFeatures",
    "FeatureConfig", "FilterFeatures", "GPT2Config", "Head",
    "LabelSmoothCrossEntropyLoss", "LongformerConfig", "MLPBlock",
    "MergeTabular", "Model", "NextItemPredictionTask", "PredictionTask",
    "PretrainedEmbeddingFeatures", "PretrainedEmbeddingsInitializer",
    "ReformerConfig", "RegressionTask", "Schema", "SequenceEmbeddingFeatures",
    "SequentialBlock", "SequentialTabularTransformations", "SoftEmbedding",
    "SoftEmbeddingFeatures", "StackFeatures", "StochasticSwapNoise",
    "T4RecConfig", "T4RecTrainingArguments", "TableConfig",
    "TabularAggregation", "TabularBlock", "TabularDropout", "TabularFeatures",
    "TabularLayerNorm", "TabularModule", "TabularSequenceFeatures",
    "TabularTransformation", "Trainer", "TransfoXLConfig", "TransformerBlock",
    "XLNetConfig", "build_blocks", "data", "ranking_metric",
    "requires_schema", "right_shift_block",
]

TPU_ADDITIONS = {
    # this framework's own additions beyond the reference surface
    "BertConfig", "RobertaConfig", "ColumnSchema", "Tags", "MaskingInfo",
    "TransformerEncoder", "masking_registry", "transformer_registry",
    "RNNBlock",  # GRU4Rec-style recurrent bodies (flax nn.RNN/lax.scan)
    # subpackages
    "blocks", "config", "experimental", "features", "masking", "model",
    "native", "ops", "parallel", "schema", "serving", "tabular", "trainer",
    "utils", "__version__",
}


def test_reference_export_surface():
    missing = [n for n in REFERENCE_TORCH_ALL if not hasattr(tr, n)]
    assert not missing, f"reference names absent at top level: {missing}"


def test_public_api_surface():
    expected = set(REFERENCE_TORCH_ALL) | TPU_ADDITIONS
    assert set(tr.__all__) == expected
    for name in tr.__all__:
        assert hasattr(tr, name), name


def test_registries_populated():
    assert {"clm", "mlm", "plm", "rtd"} <= set(tr.masking_registry.keys())
    assert {"xlnet", "gpt2", "bert", "albert", "electra", "roberta",
            "longformer", "reformer", "transfoxl"} <= set(tr.transformer_registry.keys())
    from transformers4rec_tpu.data.loader import dataloader_registry
    assert {"parquet", "merlin", "synthetic"} <= set(dataloader_registry.keys())
    from transformers4rec_tpu.model.ranking_metric import ranking_metrics_registry
    assert {"ndcg", "recall", "precision", "mrr", "dcg", "avg_precision"} <= set(
        ranking_metrics_registry.keys()
    )
    from transformers4rec_tpu.tabular.base import (
        tabular_aggregation_registry,
        tabular_transformation_registry,
    )
    assert {"concat", "stack", "elementwise-sum"} <= set(tabular_aggregation_registry.keys())
    assert {"layer-norm", "dropout", "stochastic-swap-noise"} <= set(
        tabular_transformation_registry.keys()
    )


def test_build_blocks_and_aliases():
    import jax
    import jax.numpy as jnp

    seq = tr.build_blocks(tr.MLPBlock(dimensions=(8,)), tr.MLPBlock(dimensions=(4,)))
    assert isinstance(seq, tr.SequentialBlock)
    x = jnp.ones((2, 3, 6))
    params = seq.init(jax.random.PRNGKey(0), x)
    out, _ = seq.apply(params, x)
    assert out.shape == (2, 3, 4)
    assert tr.BlockBase is tr.Block
    assert tr.TabularModule is tr.TabularBlock


def test_sequential_tabular_transformations():
    import jax
    import jax.numpy as jnp

    chain = tr.SequentialTabularTransformations("layer-norm", "dropout")
    inputs = {"a": jnp.ones((2, 3, 4))}
    params = chain.init({"params": jax.random.PRNGKey(0)}, inputs)
    out = chain.apply(params, inputs)
    assert out["a"].shape == (2, 3, 4)
    # single-list calling convention (reference tabular/base.py:133-138)
    chain2 = tr.SequentialTabularTransformations(["layer-norm"])
    assert len(chain2.transformations) == 1


def test_pretrained_embeddings_initializer():
    import jax
    import jax.numpy as jnp

    weights = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
    init = tr.PretrainedEmbeddingsInitializer(weights, trainable=False)
    got = init(jax.random.PRNGKey(0), (10, 4))
    np.testing.assert_allclose(np.asarray(got), weights, rtol=1e-6)
    # MORE rows than pretrained = the vocab-padding case (setup() rounds
    # tables to vocab_padding_multiple rows): extra rows zero-fill
    padded = init(jax.random.PRNGKey(0), (16, 4))
    np.testing.assert_allclose(np.asarray(padded)[:10], weights, rtol=1e-6)
    assert np.all(np.asarray(padded)[10:] == 0.0)
    with pytest.raises(ValueError):
        init(jax.random.PRNGKey(0), (9, 4))   # fewer rows than pretrained
    with pytest.raises(ValueError):
        init(jax.random.PRNGKey(0), (10, 8))  # wrong embedding dim
    with pytest.raises(ValueError):
        tr.PretrainedEmbeddingsInitializer(np.zeros(3))

    # threads through the schema-driven table factory
    from transformers4rec_tpu.features.embedding import build_feature_configs
    from transformers4rec_tpu.data.synthetic import synthetic_ecommerce_data_schema

    schema = synthetic_ecommerce_data_schema(num_items=9, num_categories=4)
    item_col = schema.item_id_column_name
    card = schema.categorical_cardinalities()[item_col]
    w = np.zeros((card, 4), dtype=np.float32)
    cfgs = build_feature_configs(
        schema.select_by_name([item_col]),
        embedding_dims={item_col: 4},
        embeddings_initializers={item_col: tr.PretrainedEmbeddingsInitializer(w)},
    )
    tbl = cfgs[item_col].table
    got = tbl.initializer(jax.random.PRNGKey(0), (card, 4))
    assert float(jnp.abs(got).sum()) == 0.0


def test_requires_schema_decorator():
    @tr.requires_schema
    class Thing:
        pass

    assert Thing.REQUIRES_SCHEMA is True
