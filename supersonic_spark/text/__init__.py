"""Text analysis + deduplication for large-scale training-data pipelines."""

from .analysis import (
    doc_fingerprint,
    langid_expr,
    portable_hash64,
    quality_score,
    token_count,
)
from .dedup import (
    exact_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
)

__all__ = [
    "doc_fingerprint",
    "exact_dedup",
    "langid_expr",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "portable_hash64",
    "quality_score",
    "simhash64",
    "token_count",
]
