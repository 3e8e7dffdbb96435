from .readers import (
    read_initial_ranking, read_intents, read_pagerank, read_qrels,
    read_trec_file, split_diversity_rankings,
)

__all__ = [
    "read_initial_ranking", "read_intents", "read_pagerank", "read_qrels",
    "read_trec_file", "split_diversity_rankings",
]
