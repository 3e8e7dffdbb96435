from .tokenizer import (
    Analyzer,
    LUCENE_STOP_WORDS,
    analyze,
    simple_tokenize,
)
from .kstem import kstem

__all__ = [
    "Analyzer",
    "LUCENE_STOP_WORDS",
    "analyze",
    "simple_tokenize",
    "kstem",
]
