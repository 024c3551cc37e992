from . import dedup, graph, similarity, text  # noqa: F401

__all__ = ["dedup", "graph", "similarity", "text"]
