"""Percolator: reverse search — match a REGISTERED query set against a
stream of documents (Elasticsearch percolate / Lucene Monitor pattern;
the reference's engine answers queries against a fixed index, this is
the transpose for alerting/routing pipelines).

Scale design: the compiled query set (thousands of stored queries) is
tiny next to the corpus — it broadcasts once into each worker via the
task closure and the documents STREAM through a map-only stage; there
is no shuffle and no index. Matching uses the classic percolator
counting algorithm: an inverted map term → [query slots needing it],
one counter bump per (distinct doc term × interested query), so cost
scales with actual term overlap, not |docs| × |queries|.
"""

from __future__ import annotations

import pyarrow as pa

from ..analysis.tokenizer import simple_tokenize


def compile_queries(queries: list[tuple[str, str]]):
    """[(qid, 'term term ... "a phrase" ...')] → (qids, needed[],
    term→[slots], phrases[]). Each stored query is a conjunction
    (Lucene BooleanQuery MUST) of analyzed terms; QUOTED segments add
    a phrase (adjacency) constraint — Elasticsearch percolator
    match_phrase clauses. The counting prefilter treats phrase tokens
    as plain required terms (necessary condition), the positional
    verify runs only on counting survivors — the classic two-stage
    percolator. A query whose tokens all analyze away matches nothing
    (slot dropped). Duplicate terms inside one query count once."""
    qids: list[str] = []
    needed: list[int] = []
    term2q: dict[str, list[int]] = {}
    phrases: list[list[tuple[str, ...]]] = []
    for qid, qtext in queries:
        qtext = qtext or ""
        ph: list[tuple[str, ...]] = []
        bare: list[str] = []
        pos = 0
        while True:
            i = qtext.find('"', pos)
            if i < 0:
                bare.extend(simple_tokenize(qtext[pos:]))
                break
            bare.extend(simple_tokenize(qtext[pos:i]))
            j = qtext.find('"', i + 1)
            if j < 0:                      # unbalanced: literal tail
                bare.extend(simple_tokenize(qtext[i + 1:]))
                break
            toks = tuple(simple_tokenize(qtext[i + 1:j]))
            if len(toks) >= 2:
                ph.append(toks)
            else:
                bare.extend(toks)
            pos = j + 1
        terms = set(bare) | {t for p in ph for t in p}
        if not terms:
            continue
        slot = len(qids)
        qids.append(qid)
        needed.append(len(terms))
        phrases.append(ph)
        for t in terms:
            term2q.setdefault(t, []).append(slot)
    return qids, needed, term2q, phrases


def percolate(docs_ds, queries: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset (qid, ``id_col``): one row per (stored query, document)
    match. Conjunctive stored queries over the simple analyzer."""
    compiled = compile_queries(queries)

    def _has_phrase(toks: list[str], phrase: tuple[str, ...]) -> bool:
        k = len(phrase)
        first = phrase[0]
        for i in range(len(toks) - k + 1):
            if toks[i] == first and tuple(toks[i:i + k]) == phrase:
                return True
        return False

    def match_batch(b: pa.Table) -> pa.Table:
        qids, needed, term2q, phrases = compiled
        out_q: list[str] = []
        out_d: list = []
        ids = b[id_col].to_pylist()
        for did, text in zip(ids, b[text_col].to_pylist()):
            toks = simple_tokenize(text or "")
            counts: dict[int, int] = {}
            for t in set(toks):
                for slot in term2q.get(t, ()):
                    counts[slot] = counts.get(slot, 0) + 1
            for slot, c in counts.items():
                if c != needed[slot]:
                    continue
                if all(_has_phrase(toks, p) for p in phrases[slot]):
                    out_q.append(qids[slot])
                    out_d.append(did)
        return pa.table({"qid": pa.array(out_q, pa.string()),
                         id_col: pa.array(out_d, b.schema.field(id_col).type)})

    return docs_ds.map_batches(match_batch, batch_format="pyarrow")
