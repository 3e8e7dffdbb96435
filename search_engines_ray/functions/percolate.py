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
    """[(qid, 'term term ...')] → (qids, needed[], term→[(slot, n_req)])
    Each stored query is a conjunction (Lucene BooleanQuery MUST) of
    analyzed terms; a query whose tokens all analyze away matches
    nothing (slot dropped). Duplicate terms inside one query count
    once."""
    qids: list[str] = []
    needed: list[int] = []
    term2q: dict[str, list[int]] = {}
    for qid, qtext in queries:
        terms = set(simple_tokenize(qtext or ""))
        if not terms:
            continue
        slot = len(qids)
        qids.append(qid)
        needed.append(len(terms))
        for t in terms:
            term2q.setdefault(t, []).append(slot)
    return qids, needed, term2q


def percolate(docs_ds, queries: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset (qid, ``id_col``): one row per (stored query, document)
    match. Conjunctive stored queries over the simple analyzer."""
    compiled = compile_queries(queries)

    def match_batch(b: pa.Table) -> pa.Table:
        qids, needed, term2q = compiled
        out_q: list[str] = []
        out_d: list = []
        ids = b[id_col].to_pylist()
        for did, text in zip(ids, b[text_col].to_pylist()):
            counts: dict[int, int] = {}
            for t in set(simple_tokenize(text or "")):
                for slot in term2q.get(t, ()):
                    counts[slot] = counts.get(slot, 0) + 1
            for slot, c in counts.items():
                if c == needed[slot]:
                    out_q.append(qids[slot])
                    out_d.append(did)
        return pa.table({"qid": pa.array(out_q, pa.string()),
                         id_col: pa.array(out_d, b.schema.field(id_col).type)})

    return docs_ds.map_batches(match_batch, batch_format="pyarrow")
