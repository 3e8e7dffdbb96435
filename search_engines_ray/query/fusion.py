"""Rank fusion for hybrid retrieval: combine a lexical (BM25) ranking
with a dense (embedding-cosine ANN) ranking by Reciprocal Rank Fusion
(Cormack/Clarke/Buettcher, SIGIR'09): ``score(d) = Σ_systems
1/(k0 + rank_s(d))``, missing docs contribute nothing.

RRF is the standard hybrid-search combiner (Elasticsearch/OpenSearch
``rrf`` retriever, Vespa/Weaviate hybrid mode) because it needs no
score calibration across systems — only ranks. Fusion itself is
driver-side by design: each input is already a top-K list (K ~ 10²),
produced by the distributed lexical and ANN paths; shipping two K-row
tables to the driver is the cheap step at any corpus scale.

The reference has no hybrid path (single Lucene index, QryEval.java),
so this extends SURVEY.md §2 in the training-data-pipeline direction:
fusing `documents` retrieval with `embeddings` similarity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def combsum_fuse(systems: list[tuple[np.ndarray, np.ndarray]],
                 k: int = 10, mnz: bool = False) -> pa.Table:
    """Score-based fusion (Fox & Shaw 1994): min-max normalize each
    system's top-K scores to [0, 1], then sum (CombSUM) — or sum ×
    number-of-systems-retrieving (CombMNZ, ``mnz=True``). The standard
    calibrated alternative to RRF when score magnitudes ARE trusted.

    ``systems`` = [(ids, scores), ...], each a top-K list (best first
    not required — normalization is order-free). A degenerate system
    whose scores are all equal normalizes to 1.0 for every doc.
    Callers round scores consistently BEFORE fusing if a float-exact
    downstream comparison matters (the registry entry rounds to 6 dp
    on both the engine and oracle side). Fusion is driver-side by
    design, same as ``rrf_fuse``: inputs are already top-K tables.
    → Arrow (doc_id, score) top-k, ties by id ascending."""
    agg: dict[int, float] = {}
    hits: dict[int, int] = {}
    for ids, scores in systems:
        s = np.asarray(scores, dtype=np.float64)
        lo, hi = (s.min(), s.max()) if s.size else (0.0, 0.0)
        norm = np.ones_like(s) if hi == lo else (s - lo) / (hi - lo)
        for i, v in zip(np.asarray(ids).tolist(), norm.tolist()):
            agg[int(i)] = agg.get(int(i), 0.0) + v
            hits[int(i)] = hits.get(int(i), 0) + 1
    if mnz:
        agg = {i: v * hits[i] for i, v in agg.items()}
    items = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "doc_id": pa.array([i for i, _ in items], pa.int64()),
        "score": pa.array([s for _, s in items], pa.float64()),
    })


def rrf_fuse(rankings: list[np.ndarray], k0: float = 60.0,
             k: int = 10) -> pa.Table:
    """Fuse ranked id lists (best first, ranks 1-based) into the RRF
    top-k. Ties break by id ascending — callers must feed lists whose
    own tie-breaks are deterministic. → Arrow (doc_id, score) with the
    RAW fused score (callers round for display)."""
    scores: dict[int, float] = {}
    for ids in rankings:
        for r, i in enumerate(np.asarray(ids).tolist(), 1):
            scores[int(i)] = scores.get(int(i), 0.0) + 1.0 / (k0 + r)
    items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "doc_id": pa.array([i for i, _ in items], pa.int64()),
        "score": pa.array([s for _, s in items], pa.float64()),
    })
