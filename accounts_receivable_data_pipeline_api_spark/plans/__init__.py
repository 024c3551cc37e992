from .registry import CORPUS, CorpusQuery, register

# Import modules for their registration side effects.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import temporal  # noqa: E402,F401

__all__ = ["CORPUS", "CorpusQuery", "register"]
