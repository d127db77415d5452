"""First-party operators: SQL transform, schema flatten, dedup,
similarity search, text analysis, multimodal column handling."""

from .flatten import flatten
from .transform import SRC_TOKEN, maybe_transform, transform

__all__ = ["transform", "maybe_transform", "flatten", "SRC_TOKEN"]
