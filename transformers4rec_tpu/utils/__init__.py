from . import data_utils, examples_utils
from .registry import Registry

__all__ = ["Registry", "data_utils", "examples_utils"]
