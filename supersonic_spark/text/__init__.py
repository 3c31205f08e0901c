"""Text analysis + deduplication for large-scale training-data pipelines."""

from .repetition import repetition_metrics
from .analysis import (
    doc_fingerprint,
    langid_expr,
    portable_hash64,
    quality_score,
    token_count,
)
from .decontaminate import decontaminate
from .dedup import (
    exact_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
)

__all__ = [
    "decontaminate",
    "doc_fingerprint",
    "exact_dedup",
    "langid_expr",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "portable_hash64",
    "quality_score",
    "repetition_metrics",
    "simhash64",
    "token_count",
]
