from . import dedup, similarity, text  # noqa: F401

__all__ = ["dedup", "similarity", "text"]
