from .models import (
    BM25Model, IndriModel, RankedBooleanModel, RetrievalModel,
    UnrankedBooleanModel, model_from_params,
)
from .parser import QueryParser, parse_query
from .eval import QueryEngine, expand_wildcards
from .fusion import combsum_fuse, rrf_fuse
from .trec import format_trec, rank_results, rank_results_candidates

__all__ = [
    "BM25Model", "IndriModel", "RankedBooleanModel", "RetrievalModel",
    "UnrankedBooleanModel", "model_from_params",
    "QueryParser", "parse_query", "QueryEngine", "expand_wildcards",
    "combsum_fuse", "rrf_fuse", "format_trec", "rank_results",
    "rank_results_candidates",
]
