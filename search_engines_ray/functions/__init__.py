from .dedup import (
    exact_dedup, minhash_lsh_dedup, ngram_jaccard, simhash_dedup,
)
from .similarity import ann_cosine_topk, ivf_ann_topk, lsh_ann_topk
from .text import (
    doc_fingerprint, language_id, quality_scores, token_stats,
)

__all__ = [
    "exact_dedup", "minhash_lsh_dedup", "ngram_jaccard", "simhash_dedup",
    "ann_cosine_topk", "ivf_ann_topk", "lsh_ann_topk",
    "doc_fingerprint", "language_id", "quality_scores", "token_stats",
]
