from .hashing import md5_fingerprint, portable_hash64
from .text_metrics import norm_text, token_count, tokens
from .vectors import cosine_similarity, dot_product, l2_norm, to_double_array

__all__ = [
    "md5_fingerprint",
    "portable_hash64",
    "norm_text",
    "tokens",
    "token_count",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "to_double_array",
]
