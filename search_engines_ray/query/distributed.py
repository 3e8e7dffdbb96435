"""Distributed batch query evaluation over the Parquet index with Ray Data.

The driver-side ``QueryEngine`` fetches a handful of posting lists per
query — right for interactive use. This module is the *batch* path: score
a whole query set against a huge index as one Ray Data pipeline:

  read postings (bucket-pruned, term-filtered)
    → map_batches decode+score (vectorized BM25 leaf math per posting row)
      with per-batch partial accumulation on packed int64 keys
      ``qcode << 44 | docid`` (never string keys in the hot path)
    → groupby(gkey).sum                       [the one shuffle]
    → per-batch partial top-k per query (exact: a row below its batch's
      kth score has ≥k strictly-greater rows in that batch alone)
    → driver merge: attach external ids, exact (score desc, external_id
      asc) top-k per qid.

Scale notes: the postings read prunes to the buckets the query terms
hash to; doclens are docid-range-sharded (``_ShardedDoclens``): workers
load only the pid ranges their posting runs touch, cached per process —
no O(n_docs) broadcast anywhere. External ids are fetched for the final
candidate set via a filtered forward scan. The packed key leaves 44 bits
for docids and 19 for queries per batch.

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

_DOC_BITS = 44
_DOC_MASK = (1 << _DOC_BITS) - 1

# process-global doclen shard cache: Ray reuses worker processes, so
# shards loaded for one batch serve every later batch scheduled on the
# same worker. Key = (index_dir, field, pid); capped FIFO so a worker
# never holds more than _MAX_SHARDS pid ranges resident.
_SHARD_CACHE: dict = {}
_MAX_SHARDS = 128


def _doclen_shard(index_dir: str, field: str, pid: int) -> np.ndarray:
    key = (index_dir, field, pid)
    arr = _SHARD_CACHE.get(key)
    if arr is None:
        arr = IndexReader(index_dir).doclen_shard(field, pid)
        if len(_SHARD_CACHE) >= _MAX_SHARDS:
            _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
        _SHARD_CACHE[key] = arr
    return arr


class _ShardedDoclens:
    """Docid-range-sharded doclen lookup: a posting run's docids map to a
    handful of contiguous pid ranges (the build's salt layout keeps runs
    docid-range-local), so each scoring worker touches few shards and the
    process cache amortizes them across batches. Replaces the dense
    ``ray.put(doclens)`` broadcast, which is O(n_docs) memory per node —
    4 TB at the 10^12-doc design point."""

    def __init__(self, index_dir: str, field: str, pid_offsets: np.ndarray):
        self.index_dir = index_dir
        self.field = field
        self.offsets = pid_offsets

    def get(self, docids: np.ndarray) -> np.ndarray:
        out = np.empty(docids.size, dtype=np.int32)
        pids = np.searchsorted(self.offsets, docids, side="right") - 1
        for p in np.unique(pids):
            m = pids == p
            shard = _doclen_shard(self.index_dir, self.field, int(p))
            out[m] = shard[docids[m] - self.offsets[p]]
        return out


def bm25_batch_search(index_dir: str, queries: list[tuple[str, str]],
                      model: BM25Model | None = None, k: int = 100,
                      field: str = "body") -> pa.Table:
    """Score a BM25 bag-of-words query batch; → (qid, external_id, rank,
    score), reference ordering per qid."""
    model = model or BM25Model()
    reader = IndexReader(index_dir)
    an = Analyzer(simple=(reader.stats.get("analyzer") == "simple"))

    qids = [qid for qid, _ in queries]
    qcode = {qid: i for i, qid in enumerate(qids)}
    # term -> [(qcode, multiplicity)]: a repeated query term scores per
    # occurrence, as #SUM over duplicate args does
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    if not term_queries:
        return _empty()

    buckets = sorted({term_bucket(t, reader.num_buckets) for t in term_queries})
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths: list[str] = []
    for b in buckets:
        d = os.path.join(base, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return _empty()

    # broadcast small sides once (ray.put), read per actor — never per
    # batch; doclens are NOT broadcast: workers load docid-range shards
    # on demand (see _ShardedDoclens)
    tq_ref = ray.put(term_queries)
    df_ref = ray.put(_global_dfs(index_dir, reader, list(term_queries), field))
    N = reader.n_docs
    avglen = reader.avg_len(field)
    pid_offsets = reader.pid_offsets
    k1, b = model.k1, model.b
    terms_list = sorted(term_queries)

    ds = ray.data.read_parquet(
        paths, columns=["term", "field", "docid_blob", "tf_blob"],
        filter=(pa.compute.field("term").isin(terms_list)
                & (pa.compute.field("field") == field)))

    class ScoreBatch:
        def __init__(self):
            self.dl = _ShardedDoclens(index_dir, field, pid_offsets)
            self.tq = ray.get(tq_ref)
            self.global_df = ray.get(df_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys_out, scores_out = [], []
            for term, db, tb in zip(batch["term"].to_pylist(),
                                    batch["docid_blob"].to_pylist(),
                                    batch["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                df = self.global_df[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                dl = self.dl.get(docids).astype(np.float64)
                tf = tfs.astype(np.float64)
                s = idf * (tf / (tf + k1 * ((1.0 - b) + b * dl / avglen)))
                for qc, mult in self.tq[term]:
                    keys_out.append((np.int64(qc) << _DOC_BITS) | docids)
                    scores_out.append(s if mult == 1 else s * mult)
            if not keys_out:
                return _partial_empty()
            key_c = np.concatenate(keys_out)
            sc_c = np.concatenate(scores_out)
            # partial per-(query, docid) accumulate inside the batch
            uniq, inv = np.unique(key_c, return_inverse=True)
            agg = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(agg, inv, sc_c)
            return pa.table({
                "part": pa.array((uniq % _NPART).astype(np.int32)),
                "gkey": pa.array(uniq),
                "score": pa.array(agg)})

    _NPART = max(8, int(ray.cluster_resources().get("CPU", 8)))
    # coalesce the bucket-file blocks: larger scoring batches make the
    # in-batch (query, docid) partial aggregation deduplicate across more
    # terms before the shuffle
    ds = ds.repartition(min(_NPART, max(1, len(paths) // 2)))
    scored = ds.map_batches(ScoreBatch, batch_format="pyarrow",
                            batch_size=None, concurrency=2)

    def agg_topk(bt: pa.Table) -> pa.Table:
        """One hash partition of (query, docid) keys: final sum + exact
        per-query candidate cut, all numpy (keys are co-located because
        part = gkey % NPART). Rows below their query's kth score in a
        partition have ≥k strictly-greater rows in that partition alone,
        so dropping them is exact."""
        gk = bt["gkey"].to_numpy()
        sc = bt["score"].to_numpy()
        uniq, inv = np.unique(gk, return_inverse=True)
        agg = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(agg, inv, sc)
        qc = (uniq >> _DOC_BITS).astype(np.int64)
        keep = np.ones(uniq.size, dtype=bool)
        for q in np.unique(qc):
            m = qc == q
            s = agg[m]
            if s.size > k:
                kth = np.partition(s, -k)[-k]
                keep[m] = s >= kth
        return pa.table({"gkey": pa.array(uniq[keep]),
                         "score": pa.array(agg[keep])})

    cand_batches = list(
        scored.groupby("part").map_groups(agg_topk, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    cands = pa.concat_tables(cand_batches) if cand_batches else _partial_empty()
    if "part" in cands.column_names:
        cands = cands.drop_columns(["part"])
    if cands.num_rows == 0:
        return _empty()
    gk = cands["gkey"].to_numpy()
    sc = cands["score"].to_numpy()
    qc = (gk >> _DOC_BITS).astype(np.int64)
    docid = (gk & _DOC_MASK).astype(np.int64)
    # candidate set only (≤ parts × k per query) — a filtered forward
    # scan, never a dense n_docs-sized id array
    eids = reader.external_ids_for(docid)
    out_qid, out_eid, out_rank, out_score = [], [], [], []
    for q in range(len(qids)):
        m = qc == q
        if not m.any():
            continue
        order = np.lexsort((eids[m], -sc[m]))[:k]
        ids_q = eids[m][order]
        sc_q = sc[m][order]
        out_qid.extend([qids[q]] * order.size)
        out_eid.extend(ids_q.tolist())
        out_rank.extend(range(1, order.size + 1))
        out_score.extend(sc_q.tolist())
    return pa.table({
        "qid": pa.array(out_qid, pa.string()),
        "external_id": pa.array(out_eid, pa.string()),
        "rank": pa.array(np.asarray(out_rank, dtype=np.int32)),
        "score": pa.array(out_score, pa.float64()),
    })


def _global_dfs(index_dir: str, reader: IndexReader, terms: list[str],
                field: str) -> dict[str, int]:
    """Global df per term = sum of run dfs — a metadata-only parquet scan
    (no blob decode)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths = []
    for b in sorted({term_bucket(t, reader.num_buckets) for t in terms}):
        d = os.path.join(base, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return {}
    t = pads.dataset(paths, format="parquet").to_table(
        columns=["term", "df"],
        filter=(pc.field("term").isin(terms) & (pc.field("field") == field)))
    out: dict[str, int] = {}
    for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
        out[term] = out.get(term, 0) + df
    return out


def _partial_empty() -> pa.Table:
    return pa.table({"gkey": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def _empty() -> pa.Table:
    return pa.table({"qid": pa.array([], pa.string()),
                     "external_id": pa.array([], pa.string()),
                     "rank": pa.array([], pa.int32()),
                     "score": pa.array([], pa.float64())})
