from .text import tokenize, word_count
from .sort import distributed_sort

__all__ = ["tokenize", "word_count", "distributed_sort"]
