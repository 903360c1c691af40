"""transformers4rec_tpu — TPU-native session-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
NVIDIA-Merlin/Transformers4Rec: schema-driven input modules, transformer bodies
with CLM/MLM/PLM/RTD training schemes, next-item prediction with tied embeddings
and sampled softmax, streaming ranking metrics, a pjit/mesh-sharded trainer, and
serving export.
"""

__version__ = "0.1.0"

from . import data, schema
from .schema import ColumnSchema, Schema, Tags

__all__ = ["ColumnSchema", "Schema", "Tags", "data", "schema", "__version__"]
