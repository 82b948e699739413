"""ONNX model import: wire-format parser + JAX graph builder."""

from .importer import ImportedModel, import_model, load_model
from .proto import OnnxModel, parse_model

__all__ = ["ImportedModel", "import_model", "load_model", "OnnxModel", "parse_model"]
