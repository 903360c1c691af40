"""transformers4rec_tpu — TPU-native session-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
NVIDIA-Merlin/Transformers4Rec: schema-driven input modules, transformer bodies
with CLM/MLM/PLM/RTD training schemes, next-item prediction with tied embeddings
and sampled softmax, streaming ranking metrics, a pjit/mesh-sharded trainer, and
serving export.
"""

__version__ = "0.1.0"

from . import blocks, config, data, experimental, features, masking, model, native, ops, parallel, schema, serving, tabular, trainer, utils
from .trainer import T4RecTrainingArguments, Trainer
from .blocks import MLPBlock, SequentialBlock, TransformerBlock, TransformerEncoder
from .config import (
    AlbertConfig,
    BertConfig,
    ElectraConfig,
    GPT2Config,
    LongformerConfig,
    ReformerConfig,
    RobertaConfig,
    T4RecConfig,
    TransfoXLConfig,
    XLNetConfig,
    transformer_registry,
)
from .features import TabularFeatures, TabularSequenceFeatures
from .masking import MaskingInfo, masking_registry
from .model import (
    BinaryClassificationTask,
    Head,
    Model,
    NextItemPredictionTask,
    RegressionTask,
)
from .schema import ColumnSchema, Schema, Tags

__all__ = [
    "AlbertConfig",
    "BertConfig",
    "BinaryClassificationTask",
    "ColumnSchema",
    "ElectraConfig",
    "GPT2Config",
    "Head",
    "LongformerConfig",
    "MaskingInfo",
    "MLPBlock",
    "Model",
    "NextItemPredictionTask",
    "RegressionTask",
    "ReformerConfig",
    "RobertaConfig",
    "Schema",
    "SequentialBlock",
    "T4RecConfig",
    "TabularFeatures",
    "TabularSequenceFeatures",
    "Tags",
    "TransfoXLConfig",
    "TransformerBlock",
    "TransformerEncoder",
    "XLNetConfig",
    "blocks",
    "config",
    "data",
    "experimental",
    "features",
    "masking",
    "masking_registry",
    "model",
    "native",
    "ops",
    "parallel",
    "schema",
    "serving",
    "T4RecTrainingArguments",
    "tabular",
    "trainer",
    "Trainer",
    "utils",
    "transformer_registry",
    "__version__",
]
