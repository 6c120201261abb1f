from .hashing import portable_hash64, portable_hash64_sql, minhash_perm, minhash_perm_sql
from .vectors import cosine_similarity, dot_product, l2_norm
from .textfns import chars, tokens, char_ngrams, char_ngrams_of_chars, token_ngrams

__all__ = [
    "portable_hash64",
    "portable_hash64_sql",
    "minhash_perm",
    "minhash_perm_sql",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "chars",
    "tokens",
    "char_ngrams",
    "char_ngrams_of_chars",
    "token_ngrams",
]
