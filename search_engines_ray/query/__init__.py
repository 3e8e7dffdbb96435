from .models import (
    BM25Model, IndriModel, RankedBooleanModel, RetrievalModel,
    UnrankedBooleanModel, model_from_params,
)
from .parser import QueryParser, parse_query
from .eval import QueryEngine
from .trec import format_trec, rank_results, rank_results_candidates

__all__ = [
    "BM25Model", "IndriModel", "RankedBooleanModel", "RetrievalModel",
    "UnrankedBooleanModel", "model_from_params",
    "QueryParser", "parse_query", "QueryEngine", "format_trec", "rank_results",
    "rank_results_candidates",
]
