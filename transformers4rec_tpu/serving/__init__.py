from .export import InferenceRunner, export_model, load_runner
from .server import DynamicBatcher, ServingServer
from .sharded import ShardedInferenceRunner, load_sharded_runner

__all__ = [
    "DynamicBatcher",
    "InferenceRunner",
    "ServingServer",
    "ShardedInferenceRunner",
    "export_model",
    "load_runner",
    "load_sharded_runner",
]
