from .export import InferenceRunner, export_model, load_runner
from .server import DynamicBatcher, ServingServer

__all__ = [
    "DynamicBatcher",
    "InferenceRunner",
    "ServingServer",
    "export_model",
    "load_runner",
]
