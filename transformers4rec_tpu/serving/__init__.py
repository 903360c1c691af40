from .export import InferenceRunner, export_model, load_runner

__all__ = ["InferenceRunner", "export_model", "load_runner"]
