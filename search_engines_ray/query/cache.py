"""Serving-layer result cache — the LRU every production engine puts in
front of its scorer (the reference has no serving layer at all; Lucene
deployments lean on OS page cache + app-level query caches for the same
effect). Correctness contract: a cache entry is keyed by the full query
identity (query string, k, model parameters) AND the index state (stats
mtime token + tombstone count), so index merges, compactions, rebuilds
and deletions invalidate implicitly — a stale hit is impossible without
time travel on the stats file.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import pyarrow as pa

from .models import BM25Model, IndriModel, RetrievalModel


def _model_fingerprint(m: RetrievalModel) -> tuple:
    if isinstance(m, BM25Model):
        return ("bm25", m.k1, m.b)
    if isinstance(m, IndriModel):
        return ("indri", m.mu, m.lambda_)
    return (type(m).__name__,)


class CachedSearcher:
    """LRU cache over ``QueryEngine.search``. Hits return the SAME Arrow
    table (immutable — Arrow tables are append-only views, safe to
    share). Per-process; at cluster scale each serving replica holds its
    own (query streams are Zipfian, so even small per-replica caches hit
    the head of the distribution — the standard architecture, no shared
    state needed)."""

    def __init__(self, engine, capacity: int = 1024):
        self.engine = engine
        self.capacity = int(capacity)
        self._lru: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _index_token(self) -> tuple:
        r = self.engine.reader
        dels = r.deleted_docids()
        dpath = os.path.join(r.index_dir, "deletes.json")
        dmt = os.path.getmtime(dpath) if os.path.exists(dpath) else 0.0
        return (r.stats_token, int(dels.size), dmt)

    def search(self, query: str, k: int = 100) -> pa.Table:
        key = (query, int(k), _model_fingerprint(self.engine.model),
               self._index_token())
        hit = self._lru.get(key)
        if hit is not None:
            self._lru.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        res = self.engine.search(query, k=k)
        self._lru[key] = res
        if len(self._lru) > self.capacity:
            self._lru.popitem(last=False)
        return res

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "entries": len(self._lru), "capacity": self.capacity}
