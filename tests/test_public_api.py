"""Public-API surface lock (reference tests/unit/torch/test_public_api.py)."""

import transformers4rec_tpu as tr

EXPECTED_TOP_LEVEL = {
    # classes / functions
    "BinaryClassificationTask",
    "ColumnSchema",
    "Head",
    "MaskingInfo",
    "MLPBlock",
    "Model",
    "NextItemPredictionTask",
    "RegressionTask",
    "Schema",
    "SequentialBlock",
    "T4RecConfig",
    "T4RecTrainingArguments",
    "AlbertConfig",
    "BertConfig",
    "ElectraConfig",
    "GPT2Config",
    "LongformerConfig",
    "ReformerConfig",
    "RobertaConfig",
    "TransfoXLConfig",
    "TabularFeatures",
    "TabularSequenceFeatures",
    "Tags",
    "Trainer",
    "TransformerBlock",
    "TransformerEncoder",
    "XLNetConfig",
    # registries
    "masking_registry",
    "transformer_registry",
    # subpackages
    "blocks",
    "config",
    "data",
    "experimental",
    "features",
    "masking",
    "model",
    "native",
    "ops",
    "parallel",
    "schema",
    "serving",
    "tabular",
    "trainer",
    "utils",
    "__version__",
}


def test_public_api_surface():
    assert set(tr.__all__) == EXPECTED_TOP_LEVEL
    for name in EXPECTED_TOP_LEVEL:
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
