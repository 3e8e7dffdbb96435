"""Retrieval model parameter holders — the reference's
``RetrievalModel*`` classes (``/root/reference/QryEval/RetrievalModel*.java``)
plus the parameter-file parsing rules (``QryEval.java:248-301``).

Each model names the default operator its queries are wrapped in
(``QryEval.java:483-484,704-705``): boolean → ``#or``, BM25 → ``#sum``,
Indri → ``#and``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class RetrievalModel:
    default_op: str = "#or"


@dataclass
class UnrankedBooleanModel(RetrievalModel):
    default_op: str = "#or"


@dataclass
class RankedBooleanModel(RetrievalModel):
    default_op: str = "#or"


@dataclass
class BM25Model(RetrievalModel):
    """k1/b/k3 as in the reference (RetrievalModelBM25; k3's user-weight
    term is identically 1 in the scorer, QrySopScore.java:112)."""
    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0
    default_op: str = "#sum"


@dataclass
class IndriModel(RetrievalModel):
    """Dirichlet-smoothed query likelihood with Jelinek-Mercer mix
    (QrySopScore.java:140-161)."""
    mu: float = 2500.0
    lambda_: float = 0.4
    default_op: str = "#and"


@dataclass
class TFIDFModel(RetrievalModel):
    """Lucene ClassicSimilarity (the pre-BM25 default the reference's
    Lucene 4.3 backend shipped): per-term score =
    ``sqrt(tf) * idf^2 / sqrt(dl)`` with ``idf = 1 + ln(N / (df + 1))``,
    summed over query terms (#SUM). queryNorm is a per-query constant
    (rank-invariant) and coord is omitted, as in BooleanQuery with
    coord disabled (Lucene >= 6 default) — both choices keep rankings
    well-defined without changing relative order for a fixed query."""
    default_op: str = "#sum"


def model_from_params(params: dict) -> RetrievalModel:
    """Parameter-file dispatch, mirroring ``initializeRetrievalModel``
    (QryEval.java:248-301). Keys as in the reference param files:
    ``retrievalAlgorithm``, ``BM25:k_1``, ``BM25:b``, ``BM25:k_3``,
    ``Indri:mu``, ``Indri:lambda``."""
    algo = params.get("retrievalAlgorithm", "bm25").lower()
    if algo == "unrankedboolean":
        return UnrankedBooleanModel()
    if algo == "rankedboolean":
        return RankedBooleanModel()
    if algo == "bm25":
        return BM25Model(k1=float(params.get("BM25:k_1", 1.2)),
                         b=float(params.get("BM25:b", 0.75)),
                         k3=float(params.get("BM25:k_3", 0.0)))
    if algo == "indri":
        return IndriModel(mu=float(params.get("Indri:mu", 2500)),
                          lambda_=float(params.get("Indri:lambda", 0.4)))
    if algo == "tfidf":
        return TFIDFModel()
    raise ValueError(f"unknown retrievalAlgorithm: {algo}")


def read_parameter_file(path: str) -> dict:
    """``key=value`` lines → dict (QryEval.java:810-836)."""
    params: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            params[k.strip()] = v.strip()
    return params


def read_query_file(path: str) -> list[tuple[str, str]]:
    """lines ``qid:querystring`` → [(qid, query)] (QryEval.java:684-694)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            qid, q = line.split(":", 1)
            out.append((qid.strip(), q.strip()))
    return out
