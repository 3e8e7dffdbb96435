"""Naive pure-Python retrieval oracle (FIXTURES.md §3): doc-at-a-time
over in-memory dicts, plain Python floats, mirroring the reference's
formulas literally (QrySopScore.java / QrySopAnd.java / QryIopNear.java /
QryIopWindow.java / QryIopSyn.java). Shares ONLY the analyzer and the
plan-tree dataclasses with the engine — evaluation logic is independent,
so engine/oracle agreement is a real check.
"""

from __future__ import annotations

import math

import pandas as pd

from search_engines_ray.analysis import Analyzer
from search_engines_ray.query.models import (
    BM25Model, IndriModel, RankedBooleanModel, UnrankedBooleanModel,
)
from search_engines_ray.query.plan import IopNode, ScoreNode, SopNode, TermNode


class OracleIndex:
    def __init__(self, pages_df: pd.DataFrame, fields: dict | None = None):
        fields = fields or {"body": "text"}
        an = Analyzer()
        # dedup by url, first-wins under full-column sort (same rule as build)
        df = pages_df.sort_values(list(pages_df.columns)).drop_duplicates(
            "url", keep="first")
        self.urls = sorted(df["url"])
        self.docs: dict[str, dict] = {}
        self.stats: dict[str, dict] = {}
        for fname in fields:
            self.stats[fname] = {"doc_count": 0, "sum_len": 0}
        for _, row in df.iterrows():
            d = {}
            for fname, col in fields.items():
                terms, positions, flen = an.analyze(row.get(col, "") or "")
                post: dict[str, list[int]] = {}
                for t, p in zip(terms, positions):
                    post.setdefault(t, []).append(p)
                d[fname] = {"post": post, "len": flen}
                self.stats[fname]["sum_len"] += flen
                if flen > 0:
                    self.stats[fname]["doc_count"] += 1
            self.docs[row["url"]] = d
        self.n_docs = len(self.docs)

    # term -> {url: positions}
    def inv(self, term: str, field: str) -> dict[str, list[int]]:
        out = {}
        for url, d in self.docs.items():
            pos = d[field]["post"].get(term)
            if pos:
                out[url] = pos
        return out

    def doclen(self, url: str, field: str) -> int:
        return self.docs[url][field]["len"]


def eval_iop(node, idx: OracleIndex) -> dict[str, list[int]]:
    if isinstance(node, TermNode):
        return idx.inv(node.term, node.field)
    assert isinstance(node, IopNode)
    kids = [eval_iop(a, idx) for a in node.args]
    if node.op == "syn":
        out: dict[str, list[int]] = {}
        for k in kids:
            for url, pos in k.items():
                out.setdefault(url, []).extend(pos)
        return {u: sorted(p) for u, p in out.items()}
    # near / window: docs containing all args
    common = set(kids[0])
    for k in kids[1:]:
        common &= set(k)
    out = {}
    for url in common:
        lists = [k[url] for k in kids]
        if node.op == "near":
            cur = lists[0]
            for right in lists[1:]:
                matched, i, j = [], 0, 0
                while i < len(cur) and j < len(right):
                    if right[j] < cur[i]:
                        j += 1
                    elif right[j] - cur[i] <= node.dist:
                        matched.append(right[j]); i += 1; j += 1
                    else:
                        i += 1
                cur = matched
                if not cur:
                    break
            if cur:
                out[url] = cur
        else:  # window
            heads = [0] * len(lists)
            matched = []
            while all(h < len(li) for h, li in zip(heads, lists)):
                vals = [li[h] for h, li in zip(heads, lists)]
                if max(vals) - min(vals) < node.dist:
                    matched.append(max(vals))
                    heads = [h + 1 for h in heads]
                else:
                    heads[vals.index(min(vals))] += 1
            if matched:
                out[url] = matched
    return out


def _field_of(node) -> str:
    if isinstance(node, TermNode):
        return node.field
    return _field_of(node.args[0])


class _Node:
    """Materialized scorable node: matches (set of urls) + score fns."""

    def __init__(self, node, idx, model):
        self.idx, self.model = idx, model
        if isinstance(node, (TermNode, IopNode)):
            node = ScoreNode(child=node)
        self.node = node
        if isinstance(node, ScoreNode):
            self.kind = "leaf"
            self.invlist = eval_iop(node.child, idx)
            self.field = _field_of(node.child)
            self.df = len(self.invlist)
            self.ctf = sum(len(p) for p in self.invlist.values())
            self.matches = set(self.invlist)
        else:
            self.kind = node.op
            self.kids = [_Node(a, idx, model) for a in node.args]
            self.weights = node.weights
            boolean = isinstance(model, (UnrankedBooleanModel, RankedBooleanModel))
            if node.op == "and" and boolean:
                self.matches = set.intersection(*[k.matches for k in self.kids])
            else:
                self.matches = set.union(*[k.matches for k in self.kids])

    def score(self, url: str) -> float:
        m = self.model
        if self.kind == "leaf":
            tf = len(self.invlist.get(url, ()))
            if isinstance(m, UnrankedBooleanModel):
                return 1.0
            if isinstance(m, RankedBooleanModel):
                return float(tf)
            if isinstance(m, BM25Model):
                N = self.idx.n_docs
                idf = max(0.0, math.log((N - self.df + 0.5) / (self.df + 0.5)))
                st = self.idx.stats[self.field]
                avglen = st["sum_len"] / st["doc_count"]
                dl = self.idx.doclen(url, self.field)
                tfw = tf / (tf + m.k1 * ((1 - m.b) + m.b * dl / avglen))
                return idf * tfw
            if isinstance(m, IndriModel):
                return self._indri_leaf(url, tf)
        if isinstance(m, IndriModel):
            return self._indri_combine(url, default=False)
        kid_scores = [k.score(url) for k in self.kids if url in k.matches]
        if self.kind == "and":
            if isinstance(m, UnrankedBooleanModel):
                return 1.0
            return min(k.score(url) for k in self.kids)
        if self.kind == "or":
            if isinstance(m, UnrankedBooleanModel):
                return 1.0
            return max(kid_scores)
        if self.kind == "sum":
            return sum(kid_scores)
        raise ValueError(self.kind)

    def _indri_leaf(self, url, tf):
        m, st = self.model, self.idx.stats[self.field]
        mle = self.ctf / max(st["sum_len"], 1)
        dl = self.idx.doclen(url, self.field)
        return (1 - m.lambda_) * (tf + m.mu * mle) / (dl + m.mu) + m.lambda_ * mle

    def default_score(self, url) -> float:
        if self.kind == "leaf":
            return self._indri_leaf(url, 0)
        return self._indri_combine(url, default=True)

    def _indri_combine(self, url, default: bool) -> float:
        def kid_score(k):
            if default or url not in k.matches:
                return k.default_score(url)
            return k.score(url)
        if self.kind == "and":
            score = 1.0
            for k in self.kids:
                score *= kid_score(k) ** (1.0 / len(self.kids))
            return score
        sw = sum(self.weights)
        if self.kind == "wsum":
            return sum(kid_score(k) * w / sw for k, w in zip(self.kids, self.weights))
        if self.kind == "wand":
            score = 1.0
            for k, w in zip(self.kids, self.weights):
                score *= kid_score(k) ** (w / sw)
            return score
        raise ValueError(self.kind)


def oracle_search(idx: OracleIndex, plan, model, k: int = 100):
    """→ [(url, score)] ranked score desc, url asc, top-k, score >= 0."""
    if plan is None:
        return []
    root = _Node(plan, idx, model)
    rows = []
    for url in root.matches:
        s = root.score(url)
        if s >= 0:
            rows.append((url, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]
