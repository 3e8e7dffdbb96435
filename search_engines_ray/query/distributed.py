"""Distributed batch query evaluation over the Parquet index with Ray Data.

The driver-side ``QueryEngine`` fetches a handful of posting lists per
query — right for interactive use. This module is the *batch* path: score
a whole query set against a huge index as one Ray Data pipeline, the way
the index itself was built:

  read postings (bucket-pruned, term-filtered)
    → map_batches decode+score (BM25 leaf math per posting row, vectorized)
    → per-batch partial accumulate per (qid, docid)
    → groupby(["qid","docid"]).sum      [the one shuffle]
    → per-qid candidate cut (score >= kth) → external_id attach → exact
      (score desc, external_id asc) top-k

Scale notes: the postings read prunes to the buckets the query terms hash
to; doclens are broadcast via ``ray.put`` (at 10^12 docs this becomes a
docid-range-sharded side table — each scoring task would read only the
ranges its posting runs cover; the layout already orders runs by docid
range, see build.py salt contract). The per-(qid,docid) partial
aggregation inside each batch bounds shuffle volume at one row per
(query, doc) per batch.

BM25 #SUM (bag-of-words) only — the model whose accumulation is a plain
sum and hence expressible as groupby().sum() (SURVEY.md §2.4 #SUM row).
Structured operators stay on the driver path where per-term alignment is
cheap.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..analysis.tokenizer import Analyzer
from ..index.build import POSTINGS_DIR, term_bucket
from ..index.reader import IndexReader
from ..index.varbyte import decode_postings
from .models import BM25Model


def bm25_batch_search(index_dir: str, queries: list[tuple[str, str]],
                      model: BM25Model | None = None, k: int = 100,
                      field: str = "body") -> pa.Table:
    """Score a BM25 bag-of-words query batch; → (qid, external_id, rank,
    score), reference ordering per qid."""
    model = model or BM25Model()
    reader = IndexReader(index_dir)
    an = Analyzer(simple=(reader.stats.get("analyzer") == "simple"))

    # qid -> multiset of analyzed terms (a repeated query term scores per
    # occurrence, as #SUM over duplicate args does)
    term_queries: dict[str, list[tuple[str, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in terms:
            term_queries.setdefault(t, []).append((qid, terms.count(t)))
    term_queries = {t: sorted(set(v)) for t, v in term_queries.items()}
    if not term_queries:
        return _empty()

    buckets = sorted({term_bucket(t, reader.num_buckets) for t in term_queries})
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths = []
    for b in buckets:
        d = os.path.join(base, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return _empty()

    # broadcast small sides once (ray.put), read per actor — never per batch
    doclen_ref = ray.put(reader.doclens(field))
    tq_ref = ray.put(term_queries)
    N = reader.n_docs
    avglen = reader.avg_len(field)
    k1, b = model.k1, model.b
    terms_list = sorted(term_queries)

    ds = ray.data.read_parquet(
        paths, columns=["term", "field", "df", "docid_blob", "tf_blob"],
        filter=(pa.compute.field("term").isin(terms_list)
                & (pa.compute.field("field") == field)))

    class ScoreBatch:
        def __init__(self):
            self.doclens = ray.get(doclen_ref)
            self.tq = ray.get(tq_ref)
            # global df per term needs all runs; reader stats are exact and
            # already computed at build time, so fetch df from the
            # bucket-pruned metadata once per actor
            r = IndexReader(index_dir)
            posts = r.postings_many(terms_list, field, positions=False)
            self.global_df = {t: p.df for t, p in posts.items()}

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids_out, docids_out, scores_out = [], [], []
            terms = batch["term"].to_pylist()
            dblobs = batch["docid_blob"].to_pylist()
            tblobs = batch["tf_blob"].to_pylist()
            for term, db, tb in zip(terms, dblobs, tblobs):
                docids, tfs, _ = decode_postings(db, tb, None)
                df = self.global_df[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                dl = self.doclens[docids].astype(np.float64)
                tf = tfs.astype(np.float64)
                s = idf * (tf / (tf + k1 * ((1.0 - b) + b * dl / avglen)))
                for qid, mult in self.tq[term]:
                    qids_out.append(np.full(docids.size, qid, dtype=object))
                    docids_out.append(docids)
                    scores_out.append(s * mult)
            if not qids_out:
                return _partial_empty()
            qid_c = np.concatenate(qids_out)
            doc_c = np.concatenate(docids_out)
            sc_c = np.concatenate(scores_out)
            # partial per-(qid, docid) accumulate inside the batch
            order = np.lexsort((doc_c, qid_c))
            qid_c, doc_c, sc_c = qid_c[order], doc_c[order], sc_c[order]
            new = np.empty(qid_c.size, dtype=bool)
            new[0] = True
            new[1:] = (qid_c[1:] != qid_c[:-1]) | (doc_c[1:] != doc_c[:-1])
            gid = np.cumsum(new) - 1
            agg = np.zeros(int(gid[-1]) + 1, dtype=np.float64)
            np.add.at(agg, gid, sc_c)
            starts = np.flatnonzero(new)
            return pa.table({
                "qid": pa.array(qid_c[starts].tolist(), pa.string()),
                "docid": pa.array(doc_c[starts], pa.int64()),
                "score": pa.array(agg, pa.float64()),
            })

    scored = ds.map_batches(ScoreBatch, batch_format="pyarrow", concurrency=2)
    from ray.data.aggregate import Sum
    summed = scored.groupby(["qid", "docid"]).aggregate(
        Sum("score", alias_name="score"))

    def topk_group(g):
        import pandas as pd
        s = g["score"].to_numpy()
        if s.size > k:
            kth = np.partition(s, -k)[-k]
            g = g[s >= kth]          # keep boundary ties for exact ordering
        return g
    cands = summed.groupby("qid").map_groups(topk_group, batch_format="pandas")
    pdf = cands.to_pandas()
    if pdf.empty:
        return _empty()
    ext = reader.external_ids()
    pdf["external_id"] = ext[pdf["docid"].to_numpy()]
    out = []
    for qid, g in pdf.groupby("qid", sort=True):
        g = g.sort_values(["score", "external_id"],
                          ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g[["qid", "external_id", "rank", "score"]])
    import pandas as pd
    return pa.Table.from_pandas(pd.concat(out, ignore_index=True),
                                preserve_index=False)


def _partial_empty() -> pa.Table:
    return pa.table({"qid": pa.array([], pa.string()),
                     "docid": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def _empty() -> pa.Table:
    return pa.table({"qid": pa.array([], pa.string()),
                     "external_id": pa.array([], pa.string()),
                     "rank": pa.array([], pa.int32()),
                     "score": pa.array([], pa.float64())})
