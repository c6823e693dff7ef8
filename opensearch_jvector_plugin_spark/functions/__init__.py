from .tokenizer import TOKEN_PATTERN, tokenize_col, tokenize_text
from .bm25 import BM25_K1, BM25_B, bm25_idf, bm25_tf_norm

__all__ = [
    "TOKEN_PATTERN",
    "tokenize_col",
    "tokenize_text",
    "BM25_K1",
    "BM25_B",
    "bm25_idf",
    "bm25_tf_norm",
]
